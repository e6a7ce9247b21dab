"""Serving export: freeze the inference forward to a deployable artifact.

The reference has no deployment story beyond loading a ``.pth`` in the same
codebase. For production serving this emits, into ``<out_dir>/export/``:

* ``module.stablehlo.mlir`` — the jitted inference forward (BN folded,
  merged inception convs, on-device spectrogram) lowered to StableHLO, the
  portable exchange format any XLA-backed runtime (TPU/GPU/CPU serving
  stacks, IFRT) can compile;
* ``params/`` — an Orbax checkpoint of the inference variables (optionally
  cast to the serving dtype, or weight-only int8-quantized);
* ``manifest.json`` — input/output names, shapes, dtypes, and the config
  fingerprint needed to rebuild the exact preprocessing.

``serving_dtype="int8"`` selects weight-only quantization: every conv /
linear kernel is stored as symmetric per-output-channel int8 (+ one fp32
scale per output channel), the exported module's parameter inputs are the
quantized tree, and the dequantize (int8 -> fp32 multiply) is part of the
lowered graph — XLA fuses it into the consuming conv's operand read, so
serving weight HBM traffic is 4x smaller than fp32 (2x vs bf16). BN
statistics, biases and all non-kernel leaves stay fp32 (accuracy claims are
made on the fp32/bf16 paths; int8 is a deployment size/bandwidth mode —
see VERDICT round-2 item 9).

Usage::

    python -m attention_based_tbn_tpu.tools.export \
        test.pre_trained=<ckpt> data.rgb.enable=True ...

or programmatically via :func:`export_inference`.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Sequence


import jax
import jax.numpy as jnp


def _output_row_multipliers(
    forward, variables, cfg, modality, batch_size, n_seg, output_names,
    out_struct,
):
    """Per-output rows-per-sample, VERIFIED batch-invariant.

    Divisibility of the leading dim by ``batch_size`` alone can mislabel a
    genuinely global output (always at ``batch_size=1``) as per-row — and
    the manifest is the serving source of truth that predict()/
    BatchingFront trust for trimming/splitting. So an output is declared
    per-row (multiplier k) only if its leading dim scales LINEARLY with
    the batch: ``lead(b) == k*b`` at both the export batch and a second
    abstract trace at ``b+1`` (eval_shape — no lowering, no compile).
    Anything else is ``null``: served whole, never trimmed, and
    BatchingFront refuses to coalesce across requests (tools/serve.py)."""
    leaves1 = [leaf for _, leaf in jax.tree_util.tree_flatten_with_path(out_struct)[0]]
    batch2 = _example_batch(cfg, modality, batch_size + 1, n_seg)
    out_struct2 = jax.eval_shape(forward, variables, batch2)
    leaves2 = [
        leaf for _, leaf in jax.tree_util.tree_flatten_with_path(out_struct2)[0]
    ]

    mults = {}
    for name, leaf1, leaf2 in zip(output_names, leaves1, leaves2):
        k = None
        if leaf1.shape and leaf2.shape and leaf1.shape[0] % batch_size == 0:
            cand = leaf1.shape[0] // batch_size
            if leaf2.shape[0] == cand * (batch_size + 1):
                k = int(cand)
        mults[name] = k
    return mults


def _is_quantized_leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def quantize_int8(variables):
    """Weight-only symmetric per-output-channel int8 quantization.

    Every fp32 ``kernel`` leaf (all kernels in this model keep output
    features on the LAST axis: HWIO convs, (in, out) dense) becomes
    ``{"q": int8 kernel, "scale": fp32 (1, ..., 1, out)}`` with
    ``scale = max|w| / 127`` per output channel. Everything else (BN
    scale/bias/mean/var, conv biases, PE tables) is returned unchanged —
    the BN inference fold needs fp32 statistics (see the bf16 note below).
    """

    def q(path, x):
        is_kernel = path and getattr(path[-1], "key", None) == "kernel"
        if not (
            is_kernel
            and hasattr(x, "dtype")
            and x.dtype == jnp.float32
            and x.ndim >= 2
        ):
            return x
        axes = tuple(range(x.ndim - 1))
        amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
        qv = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        return {"q": qv, "scale": scale}

    return jax.tree_util.tree_map_with_path(q, variables)


def dequantize(qvariables):
    """Inverse of :func:`quantize_int8` (up to rounding): rebuild a dense
    fp32 variable tree. The exported int8 module embeds this in its graph;
    this helper is for running the quantized checkpoint through
    ``model.apply`` directly."""
    return jax.tree_util.tree_map(
        lambda x: (
            x["q"].astype(jnp.float32) * x["scale"] if _is_quantized_leaf(x) else x
        ),
        qvariables,
        is_leaf=_is_quantized_leaf,
    )


def _example_batch(cfg, modality: Sequence[str], batch_size: int, n_seg: int):
    crop = int(cfg.data.test_crop_size)
    audio_len = int(cfg.data.audio.audio_length * cfg.data.audio.sampling_rate)
    batch = {}
    if "RGB" in modality:
        batch["RGB"] = jnp.zeros((batch_size, n_seg, crop, crop, 3), jnp.uint8)
    if "Flow" in modality:
        win = 2 * int(cfg.data.flow.win_length)
        batch["Flow"] = jnp.zeros(
            (batch_size, n_seg, crop, crop, win), jnp.uint8
        )
    if "Audio" in modality:
        batch["Audio"] = jnp.zeros((batch_size, n_seg, audio_len), jnp.float32)
    return batch


def export_inference(
    cfg,
    modality: Sequence[str],
    state=None,
    out_dir: Optional[str] = None,
    batch_size: int = 1,
    num_segments: Optional[int] = None,
    serving_dtype: Optional[str] = None,
    batch_buckets: Optional[Sequence[int]] = None,
    logger=None,
) -> Dict[str, str]:
    """Lower the flagship inference forward and save the serving bundle.

    ``state``: a restored TrainState (tools/test.py restore path); when
    None, randomly initialized variables are exported (shape/compile
    validation without a checkpoint).
    ``batch_buckets``: extra batch sizes to lower the SAME forward at
    (e.g. ``[1]``) — written as ``module.b<k>.stablehlo.mlir`` next to the
    main module so the server (tools/serve.py) can route a small request
    to a small executable instead of padding it to the full batch.
    Returns the paths of the written artifacts.
    """
    from ..models.builder import build_model

    log = logger.info if logger else (lambda *_: None)
    model, spec = build_model(cfg, modality)
    n_seg = int(num_segments or cfg.test.num_segments)
    batch = _example_batch(cfg, modality, batch_size, n_seg)

    if state is not None:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
    else:
        rngs = {
            "params": jax.random.key(0),
            "dropout": jax.random.key(1),
            "gumbel": jax.random.key(2),
            "audio_dropout": jax.random.key(3),
        }
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            rngs, batch
        )

    def forward(variables, batch):
        return model.apply(variables, batch, train=False)

    if serving_dtype == "int8":
        # Weight-only quantization: the saved params and the module's
        # parameter inputs are the int8 tree; dequantize is in-graph.
        variables = quantize_int8(variables)

        def forward(variables, batch):  # noqa: F811 — int8 overrides
            return model.apply(dequantize(variables), batch, train=False)

    elif serving_dtype:
        # Cast only conv/linear kernels. BN scale/bias/mean/var (and conv
        # biases) stay fp32: the inference BN fold computes
        # rsqrt(var + eps); in bf16 var≈1 has ~2^-8 resolution, so eps=1e-5
        # would round away and the fold degrade beyond plain bf16 compute.
        target = jnp.dtype(serving_dtype)

        def cast(path, x):
            is_kernel = path and getattr(path[-1], "key", None) == "kernel"
            if is_kernel and hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(target)
            return x

        variables = jax.tree_util.tree_map_with_path(cast, variables)

    lowered = jax.jit(forward).lower(variables, batch)
    stablehlo = lowered.as_text(dialect="stablehlo")

    # The module's flat output order (pytree flatten of the forward's dict)
    # — tools/serve.py labels the executable's result buffers with these.
    out_struct = jax.eval_shape(forward, variables, batch)
    output_names = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(out_struct)[0]
    ]

    out_dir = out_dir or os.path.join(cfg.out_dir, "export")
    os.makedirs(out_dir, exist_ok=True)

    module_path = os.path.join(out_dir, "module.stablehlo.mlir")
    with open(module_path, "w") as fh:
        fh.write(stablehlo)

    # Extra batch buckets: the same forward lowered at smaller batches.
    # Per-sample output row multipliers are batch-invariant, so the main
    # manifest serves every bucket.
    bucket_files = {str(batch_size): os.path.basename(module_path)}
    for b in sorted(set(int(b) for b in (batch_buckets or []))):
        if b == batch_size:
            continue
        if not 1 <= b < batch_size:
            raise ValueError(
                f"batch bucket {b} must be in [1, batch_size={batch_size})"
            )
        bucket_batch = _example_batch(cfg, modality, b, n_seg)
        bucket_hlo = jax.jit(forward).lower(variables, bucket_batch).as_text(
            dialect="stablehlo"
        )
        name = f"module.b{b}.stablehlo.mlir"
        with open(os.path.join(out_dir, name), "w") as fh:
            fh.write(bucket_hlo)
        bucket_files[str(b)] = name

    params_path = os.path.join(out_dir, "params")
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if os.path.exists(params_path):
        import shutil

        shutil.rmtree(params_path)
    ckptr.save(os.path.abspath(params_path), variables)

    manifest = {
        "modality": list(modality),
        "inputs": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in batch.items()
        },
        "outputs": sorted(cfg.model.num_classes.keys()),
        # flat result-buffer labels and the expected parameter-leaf count,
        # for the module-direct executor (tools/serve.py)
        "output_names": output_names,
        # rows-per-sample of each output (1 for per-sample logits,
        # num_segments for attention weights on the folded batch; null =
        # not per-row, never trimmed) — tools/serve.py uses these to trim
        # ragged-batch responses instead of guessing from the runtime shape
        "output_row_multipliers": _output_row_multipliers(
            forward, variables, cfg, modality, batch_size, n_seg,
            output_names, out_struct,
        ),
        "param_leaf_count": len(jax.tree_util.tree_leaves(variables)),
        "num_segments": n_seg,
        "batch_size": batch_size,
        # batch size -> module file; servers compile each and route a
        # request to the smallest bucket that fits it
        "batch_buckets": bucket_files,
        "serving_dtype": serving_dtype or "float32",
        "quantization": (
            {
                "scheme": "weight-only symmetric per-output-channel",
                "bits": 8,
                "dequantize": "in-graph (module inputs are the int8 tree)",
            }
            if serving_dtype == "int8"
            else None
        ),
        "arch": cfg.model.arch,
        "attention": dict(
            enable=bool(cfg.model.attention.enable),
            type=str(cfg.model.attention.type),
        ),
        "audio": dict(
            sampling_rate=int(cfg.data.audio.sampling_rate),
            audio_length=float(cfg.data.audio.audio_length),
            spec_type=str(cfg.data.audio.spec_type),
        ),
        "stablehlo_sha256": hashlib.sha256(
            stablehlo.encode()
        ).hexdigest(),
    }
    manifest_path = os.path.join(out_dir, "manifest.json")
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh, indent=2)

    log(f"Exported StableHLO module ({len(stablehlo)//1024} KiB) -> {module_path}")
    return {
        "module": module_path,
        "params": params_path,
        "manifest": manifest_path,
    }


def main():
    import sys

    from ..config import load_config
    from ..utils.misc import get_modality
    from ..utils.platform import apply_platform_overrides

    # tpu.platform= / tpu.host_devices= must land before jax initializes
    # (the tunneled TPU plugin ignores a JAX_PLATFORMS env override).
    apply_platform_overrides(sys.argv[1:])
    cfg = load_config(overrides=sys.argv[1:])
    modality = get_modality(cfg)

    import logging

    logger = logging.getLogger("export")
    logging.basicConfig(level=logging.INFO)

    state = None
    if cfg.test.pre_trained:
        from .test import load_state

        state = load_state(cfg, logger)

    buckets = cfg.get_path("tpu.export_buckets", None)
    paths = export_inference(
        cfg,
        modality,
        state=state,
        batch_size=int(cfg.get_path("tpu.export_batch", 1)),
        serving_dtype=str(cfg.get_path("tpu.serving_dtype", "") or "") or None,
        batch_buckets=list(buckets) if buckets else None,
        logger=logger,
    )
    print(json.dumps(paths, indent=2))


if __name__ == "__main__":
    main()
