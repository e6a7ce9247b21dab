"""Device mesh construction and sharding specs.

The reference's multi-GPU story is single-process ``nn.DataParallel``
(reference core/models/model_builder.py:73-75). The TPU-native equivalent is
SPMD: one jitted step over a ``jax.sharding.Mesh`` with the batch sharded on
a ``data`` axis; XLA inserts the gradient all-reduce over ICI. BN statistics
become *global* batch statistics (an improvement over DataParallel, which
keeps the master replica's).

``gpu_ids`` (kept under the reference's config name) selects devices.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_DISTRIBUTED_INITIALIZED = False


def maybe_initialize_distributed(cfg=None) -> None:
    """Multi-host SPMD: call ``jax.distributed.initialize()`` once, before
    any backend use, when requested (``tpu.multihost=true``) or when the
    standard coordination env vars are present (TPU pod runtimes set them).
    Single-host runs are a no-op; after init, ``jax.devices()`` spans every
    host and the 1-D data mesh + batch shardings below work unchanged —
    gradient psums ride ICI across the slice."""
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return
    want = bool(cfg.get_path("tpu.multihost", False)) if cfg is not None else False
    want = want or bool(os.environ.get("COORDINATOR_ADDRESS"))
    if not want:
        return
    jax.distributed.initialize()
    _DISTRIBUTED_INITIALIZED = True


def make_mesh(cfg=None, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the selected devices."""
    subset = False
    if devices is None:
        devices = jax.devices()
        if cfg is not None:
            ids = list(cfg.get_path("gpu_ids", []) or [])
            if ids:
                by_id = {d.id: d for d in devices}
                devices = [by_id[i] for i in ids]
                subset = True
        requested = cfg.get_path("tpu.mesh.data", -1) if cfg is not None else -1
        if requested and requested > 0:
            if requested < len(devices):
                subset = True
            devices = devices[:requested]
    if jax.process_count() > 1:
        if subset:
            # devices[:N] / gpu_ids keeps the first N GLOBAL devices — on a
            # pod that silently strips other hosts' chips from every
            # process's mesh and the first shard_batch dies deep inside
            # make_array_from_process_local_data. Device subsetting is a
            # single-host surface; fail loudly here instead.
            raise RuntimeError(
                "gpu_ids / tpu.mesh.data device subsetting is not supported "
                "in multi-host runs: every process must participate with "
                "all its addressable devices. Run the full slice or shrink "
                "the job topology instead."
            )
        # The multi-host loader slices host k's rows as
        # [k*local, (k+1)*local) of the global batch (data/loader.py) and
        # make_array_from_process_local_data maps local rows onto the
        # shards this process owns — both require the mesh device order to
        # be process-contiguous in process_index order. JAX does not
        # guarantee that on every topology, so fail loudly instead of
        # silently permuting rows across hosts.
        procs = [d.process_index for d in np.asarray(devices).flat]
        if procs != sorted(procs):
            raise RuntimeError(
                "mesh device order is not process-contiguous "
                f"(process ids {procs}); the multi-host batch sharding "
                "would permute rows across hosts. Reorder devices by "
                "process_index when constructing the mesh."
            )
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every array in the batch dict with its leading axis sharded.

    Single-host: a plain device_put. Multi-host: each process holds only
    its shard of the global batch (the loader's ``shard`` argument), and
    the global array is assembled from the process-local data.

    Non-array leaves (loader meta: uid strings, python lists, ...) pass
    through unchanged, so whole loader outputs can be mapped — this is the
    one placement path for the train/test drivers AND direct callers."""
    sharding = batch_sharding(mesh)
    multihost = jax.process_count() > 1

    def put_one(x):
        # only rank>=1 arrays can take the leading-axis sharding; python
        # scalars/strings (np.isscalar is True for those!) and 0-d arrays
        # pass through — meta dicts map cleanly
        if not isinstance(x, (np.ndarray, jax.Array)) or x.ndim == 0:
            return x
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put_one, batch)
