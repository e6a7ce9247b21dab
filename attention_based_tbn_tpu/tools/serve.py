"""Serve an exported inference bundle — module-direct, no model code.

The counterpart of a production serving stack for the bundles written by
``tools/export.py``: the saved StableHLO module is compiled by the local
PJRT client (TPU/CPU — any XLA backend) and driven directly, so serving
needs neither the Flax model definition nor the training config. The
reference repo has no serving story (its ``test.py`` rebuilds the torch
model per run, core/tools/test.py:33-170); this closes the gap TPU-first:
one executable, parameters resident on device, steady-state latency =
device time.

Usage::

    # one-shot latency benchmark on synthetic manifest-shaped inputs
    python -m attention_based_tbn_tpu.tools.serve <bundle_dir> --bench 30

    # HTTP server (stdlib only): POST an .npz body of the input arrays
    python -m attention_based_tbn_tpu.tools.serve <bundle_dir> --port 8080

    curl -s -X POST --data-binary @batch.npz localhost:8080/predict > out.npz
    curl -s localhost:8080/healthz

The ``.npz`` request must contain one array per manifest input (same
names/dtypes/trailing shapes); the response ``.npz`` holds one array per
manifest output name. Requests may carry any batch 1..compiled_batch —
rows are padded to the compiled shape (repeating the first sample, the
training loader's convention) and per-row outputs trimmed back, so one
batch-static executable serves ragged client batches.
"""

from __future__ import annotations

import io
import json
import os
import threading
import time
from typing import Dict, Optional

import numpy as np


class ServerFault(RuntimeError):
    """Server-side failure (device execution, batching dispatcher, bundle
    mismatch) — maps to HTTP 5xx. Client-input problems raise ValueError
    and map to 4xx; keeping the two taxonomies distinct means an innocent
    request coalesced with a faulting group-mate gets an honest 500/503,
    never a 400 describing someone else's request."""


class DispatcherTimeout(ServerFault):
    """The batching dispatcher did not answer within the deadline — the
    request's fate is unknown (wedged device call or dead dispatcher);
    maps to 503 so clients know to retry elsewhere/later."""


class ServingModel:
    """Compiled export bundle: params resident on device, predict() runs
    the StableHLO module on a batch of numpy inputs.

    Concurrency: ``predict`` serializes device execution with a lock — the
    bundle targets ONE device, so concurrent executes would only queue in
    the PJRT stream anyway; the lock makes the queueing explicit and keeps
    per-request latency accounting honest. HTTP handler threads
    (ThreadingHTTPServer) still read/parse/respond concurrently.

    Batch buckets: when the bundle carries extra modules lowered at
    smaller batches (manifest ``batch_buckets``, tools/export.py
    ``batch_buckets=[1, ...]``), each is compiled once at load and a
    request routes to the smallest bucket that fits it — a b=1 request
    costs a b=1 execution, not a pad to the full compiled batch."""

    def __init__(self, bundle_dir: str, platform: Optional[str] = None):
        import jax

        if platform:
            jax.config.update("jax_platforms", platform)
        from ..utils.checkpoint import restore_numpy_tree

        bundle_dir = os.path.abspath(bundle_dir)
        with open(os.path.join(bundle_dir, "manifest.json")) as fh:
            self.manifest = json.load(fh)
        with open(os.path.join(bundle_dir, "module.stablehlo.mlir")) as fh:
            module = fh.read()

        variables = restore_numpy_tree(os.path.join(bundle_dir, "params"))
        param_leaves = jax.tree_util.tree_leaves(variables)
        want = self.manifest.get("param_leaf_count")
        if want is not None and want != len(param_leaves):
            raise ValueError(
                f"bundle params have {len(param_leaves)} leaves, manifest "
                f"says {want} — params/ and module.stablehlo.mlir disagree"
            )

        self._client = jax.extend.backend.get_backend()
        self._device = self._client.devices()[0]
        self._input_specs = {
            k: (tuple(v["shape"]), np.dtype(v["dtype"]))
            for k, v in self.manifest["inputs"].items()
        }
        compiled_bs = next(iter(self._input_specs.values()))[0][0]
        # batch size -> compiled executable; the main module always serves
        # its own batch, extra buckets (if shipped) serve smaller requests
        self._executables = {compiled_bs: _compile(self._client, module, self._device)}
        for bs_str, fname in (self.manifest.get("batch_buckets") or {}).items():
            bs = int(bs_str)
            path = os.path.join(bundle_dir, fname)
            if bs == compiled_bs or not os.path.exists(path):
                continue
            with open(path) as fh:
                self._executables[bs] = _compile(self._client, fh.read(), self._device)
        self.last_bucket: Optional[int] = None  # observability (tests/metrics)
        self._lock = threading.Lock()
        # parameters transfer once; every predict() only moves the batch
        self._param_bufs = [
            self._client.buffer_from_pyval(np.asarray(a), self._device)
            for a in param_leaves
        ]
        self._output_names = self.manifest.get("output_names") or list(
            self.manifest["outputs"]
        )
        # per-output rows-per-sample for ragged-batch trimming (export
        # writes these from the traced output shapes); None on legacy
        # bundles -> fall back to the divisibility heuristic in predict()
        self._row_mult = self.manifest.get("output_row_multipliers")

    @property
    def max_request_bytes(self) -> int:
        """Upper bound a server should accept for one request body: 2x the
        full-batch input payload (npz container overhead, 64-bit clients)
        plus 1 MiB slack."""
        total = sum(
            int(np.prod(shape)) * dtype.itemsize
            for shape, dtype in self._input_specs.values()
        )
        return 2 * total + (1 << 20)

    @property
    def platform(self) -> str:
        return self._client.platform

    def example_batch(self, seed: int = 0) -> Dict[str, np.ndarray]:
        """Synthetic manifest-shaped inputs (for --bench and smoke tests)."""
        rng = np.random.default_rng(seed)
        batch = {}
        for name, (shape, dtype) in self._input_specs.items():
            if dtype == np.uint8:
                batch[name] = rng.integers(0, 255, shape).astype(np.uint8)
            else:
                batch[name] = (rng.standard_normal(shape) * 0.1).astype(dtype)
        return batch

    def _validate(self, batch: Dict[str, np.ndarray]) -> tuple:
        """Validate names/dtypes/shapes; returns ({name: array}, true_bs).
        Raises ValueError for anything a client could get wrong — callers
        turn that into a 4xx."""
        if set(batch) != set(self._input_specs):
            raise ValueError(
                f"inputs {sorted(batch)} != manifest {sorted(self._input_specs)}"
            )
        true_bs = None
        arrays = {}
        for name in sorted(batch):  # pytree dict order = sorted keys
            shape, dtype = self._input_specs[name]
            arr = np.asarray(batch[name])
            if arr.dtype != dtype or arr.shape[1:] != shape[1:] or arr.ndim != len(shape):
                raise ValueError(
                    f"input {name!r}: got {arr.dtype}{list(arr.shape)}, "
                    f"module compiled for {dtype}{list(shape)}"
                )
            if not 1 <= arr.shape[0] <= shape[0]:
                raise ValueError(
                    f"input {name!r}: batch {arr.shape[0]} outside "
                    f"[1, {shape[0]}] (module compiled for batch {shape[0]})"
                )
            if true_bs is None:
                true_bs = arr.shape[0]
            elif arr.shape[0] != true_bs:
                raise ValueError(
                    f"input {name!r}: batch {arr.shape[0]} != {true_bs} of "
                    "the other inputs"
                )
            arrays[name] = arr
        return arrays, true_bs

    def _check(self, batch: Dict[str, np.ndarray]) -> tuple:
        """Validate inputs; returns (leaves, (true_batch, bucket_batch)).

        Requests smaller than the compiled batch are accepted: every input
        must carry the SAME leading batch b <= compiled batch. The request
        routes to the smallest compiled bucket >= b; rows are padded to
        that bucket by repeating the first sample (the training loader's
        pad convention, data/loader.pad_batch) and outputs are trimmed
        back in predict(). Each bucket is batch-static — one executable
        per bucket, any b."""
        arrays, true_bs = self._validate(batch)
        bucket_bs = min(b for b in self._executables if b >= true_bs)
        leaves = []
        for name in sorted(arrays):
            arr = arrays[name]
            if arr.shape[0] < bucket_bs:
                arr = np.concatenate(
                    [arr, np.repeat(arr[:1], bucket_bs - arr.shape[0], axis=0)]
                )
            leaves.append(np.ascontiguousarray(arr))
        return leaves, (true_bs, bucket_bs)

    def predict(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        leaves, (true_bs, compiled_bs) = self._check(batch)
        self.last_bucket = compiled_bs
        bufs = self._param_bufs + [
            self._client.buffer_from_pyval(a, self._device) for a in leaves
        ]
        with self._lock:  # single device: serialize execution (class doc)
            outs = _execute(self._executables[compiled_bs], bufs)
        arrays = [np.asarray(o) for o in outs]
        if len(arrays) < len(self._output_names):
            # zip would silently drop the missing outputs — a manifest /
            # module mismatch must be loud, not a truncated 200 response
            raise RuntimeError(
                f"module returned {len(arrays)} outputs but the manifest "
                f"names {len(self._output_names)}: {self._output_names} — "
                "the StableHLO module and manifest.json disagree "
                "(mixed-version bundle?)"
            )
        if len(arrays) > len(self._output_names):
            # older manifests without output_names: label extras aux_<i>
            names = list(self._output_names) + [
                f"aux_{i}" for i in range(len(arrays) - len(self._output_names))
            ]
        else:
            names = self._output_names
        if true_bs < compiled_bs:
            # trim pad rows: keep k*true_bs rows of each per-row output
            # (k=1 logits, k=segments for attention weights on the folded
            # batch). k comes from the manifest's export-time declaration;
            # legacy bundles without it fall back to a divisibility
            # heuristic, which can mis-trim a non-per-row output whose
            # leading dim is coincidentally a multiple of the batch.
            trimmed = []
            for name, arr in zip(names, arrays):
                if self._row_mult is not None:
                    k = self._row_mult.get(name)
                else:
                    lead = arr.shape[0] if arr.ndim else 0
                    k = lead // compiled_bs if lead % compiled_bs == 0 else None
                trimmed.append(arr[: k * true_bs] if k else arr)
            arrays = trimmed
        return dict(zip(names, arrays))


class BatchingFront:
    """Request micro-batching: coalesce concurrent requests into one
    device execution.

    Handler threads call :meth:`submit`; a dispatcher thread drains the
    queue, concatenates requests up to the largest compiled bucket's rows
    (waiting at most ``window_ms`` after the first request arrives), runs
    ONE ``predict`` on the combined batch, and splits the outputs back per
    request using the manifest row multipliers. Under no concurrency a
    request pays at most ``window_ms`` extra latency; under load,
    concurrent clients share an execution instead of queueing serially on
    the device lock. A request that would overflow the largest bucket is
    carried into the next cycle, so ordering is preserved and nothing
    starves.

    Coalescing REQUIRES a manifest whose outputs are all declared per-row
    (``output_row_multipliers`` present with no ``null`` values — verified
    batch-invariant at export time, tools/export.py). A ``null`` output is
    computed over the coalesced batch, i.e. over other clients' rows, and
    could not be split back per request — construction refuses rather than
    leak cross-request values. Construction raises ValueError for such
    bundles (and legacy bundles without the manifest field).

    ``submit`` waits at most ``submit_timeout_s`` for its result; expiry
    raises :class:`DispatcherTimeout` (HTTP 503) so a wedged device call
    or dead dispatcher cannot hang handler threads forever. ``close()``
    stops the dispatcher thread (idempotent); make_server wires it to
    ``server_close`` so embedding does not leak a thread per server."""

    _SHUTDOWN = object()

    def __init__(
        self,
        model: ServingModel,
        window_ms: float = 2.0,
        submit_timeout_s: float = 30.0,
    ):
        import queue

        mults = model._row_mult
        if mults is None or any(v is None for v in mults.values()):
            bad = (
                sorted(k for k, v in (mults or {}).items() if v is None)
                or "manifest missing output_row_multipliers"
            )
            raise ValueError(
                "bundle not coalescable: outputs without a per-row "
                f"multiplier would leak cross-request values: {bad}. "
                "Serve without --batch-window or re-export with "
                "tools/export.py (which verifies multipliers)."
            )
        self.model = model
        self.window = float(window_ms) / 1e3
        self.submit_timeout = float(submit_timeout_s)
        self.max_rows = max(model._executables)
        self._queue: "queue.Queue" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def close(self, join_timeout_s: float = 5.0):
        """Stop the dispatcher thread. Idempotent; safe with requests in
        flight (their submits time out with DispatcherTimeout)."""
        if self._closed:
            return
        self._closed = True
        self._queue.put(self._SHUTDOWN)
        self._thread.join(join_timeout_s)

    def submit(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        # validate on the caller's thread so a malformed request fails fast
        # (4xx) and never reaches the dispatcher
        arrays, true_bs = self.model._validate(batch)
        if self._closed:
            raise ServerFault("batching front is closed")
        item = {
            "arrays": arrays,
            "bs": true_bs,
            "event": threading.Event(),
            "result": None,
            "error": None,
        }
        self._queue.put(item)
        if not item["event"].wait(self.submit_timeout):
            raise DispatcherTimeout(
                f"no result within {self.submit_timeout:.0f}s — dispatcher "
                "wedged or shut down"
            )
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def _run(self):
        import queue

        carry = None
        while True:
            first = carry if carry is not None else self._queue.get()
            carry = None
            if first is self._SHUTDOWN:
                return
            group, rows = [first], first["bs"]
            deadline = time.perf_counter() + self.window
            while rows < self.max_rows:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is self._SHUTDOWN:
                    self._dispatch(group, rows)
                    return
                if rows + nxt["bs"] > self.max_rows:
                    carry = nxt  # next cycle; preserves arrival order
                    break
                group.append(nxt)
                rows += nxt["bs"]
            self._dispatch(group, rows)

    def _dispatch(self, group, rows):
        try:
            combined = {
                name: np.concatenate([g["arrays"][name] for g in group])
                for name in group[0]["arrays"]
            }
            preds = self.model.predict(combined)
        except Exception as exc:
            # every request in the group was already validated — a failure
            # here is a SERVER fault (device execution, bundle mismatch, or
            # a group-mate interaction). Surface it as ServerFault so an
            # innocent coalesced client gets a 5xx, never a 400 carrying
            # another client's error text.
            fault = ServerFault(f"batched execution failed: {exc}")
            for g in group:
                g["error"] = fault
                g["event"].set()
            return
        offset = 0
        for g in group:
            out = {}
            for name, arr in preds.items():
                k = self.model._row_mult[name]  # all non-null (see __init__)
                out[name] = arr[k * offset : k * (offset + g["bs"])]
            g["result"] = out
            g["event"].set()
            offset += g["bs"]


def _compile(client, module: str, device):
    """Compile MLIR text with the PJRT client across jaxlib API flavors.

    Compiles for exactly ONE device — the module is a single-replica
    inference graph; handing the whole client device list (e.g. the
    8-virtual-CPU test mesh) would build an 8-replica executable that
    demands 8 shards per argument."""
    try:
        from jaxlib import _jax

        opts = _jax.CompileOptions()
    except Exception:  # pragma: no cover - very old jaxlib
        opts = None
    if hasattr(client, "compile_and_load"):
        return client.compile_and_load(module, [device], opts)
    return client.compile(module)  # pragma: no cover - older jaxlib


def _execute(executable, bufs):
    outs = executable.execute(bufs)
    # some PJRT clients return per-device lists
    if outs and isinstance(outs[0], (list, tuple)):  # pragma: no cover
        outs = outs[0]
    return outs


def _npz_bytes(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_server(model: ServingModel, port: int, batch_window_ms: float = 0.0):
    """stdlib HTTP server: POST /predict (.npz body) -> .npz response.

    ``batch_window_ms > 0`` enables request micro-batching: concurrent
    requests arriving within the window are coalesced into one device
    execution (:class:`BatchingFront`; raises ValueError for bundles whose
    outputs are not all per-row — coalescing those would leak values across
    requests). ``server_close()`` also stops the batching dispatcher.

    Error taxonomy: client-input problems (bad npz, wrong names/dtypes/
    shapes — ValueError) -> 400; dispatcher deadline -> 503; any other
    failure is a server fault -> 500."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    front = BatchingFront(model, batch_window_ms) if batch_window_ms > 0 else None
    run = front.submit if front else model.predict

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                info = {
                    "status": "ok",
                    "platform": model.platform,
                    "inputs": model.manifest["inputs"],
                    "outputs": model.manifest["outputs"],
                    "serving_dtype": model.manifest.get("serving_dtype"),
                    "batch_buckets": sorted(model._executables),
                    "max_request_bytes": model.max_request_bytes,
                    "batch_window_ms": batch_window_ms,
                }
                self._send(200, json.dumps(info).encode(), "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", ""))
            except ValueError:
                self._send(411, b"Content-Length required", "text/plain")
                return
            if length < 0 or length > model.max_request_bytes:
                # bound the request BEFORE reading the body: an oversize
                # upload must not buffer unbounded bytes into the process
                self._send(
                    413,
                    f"request {length} bytes exceeds limit "
                    f"{model.max_request_bytes}".encode(),
                    "text/plain",
                )
                return
            body = self.rfile.read(length)
            try:
                with np.load(io.BytesIO(body)) as data:
                    batch = {k: data[k] for k in data.files}
            except Exception as exc:  # malformed body is the client's fault
                self._send(400, f"invalid npz body: {exc}".encode(), "text/plain")
                return
            try:
                preds = run(batch)
            except ValueError as exc:  # shape/dtype/name validation
                self._send(400, str(exc).encode(), "text/plain")
                return
            except DispatcherTimeout as exc:
                self._send(503, str(exc).encode(), "text/plain")
                return
            except Exception as exc:
                # server-side fault (ServerFault from a coalesced group,
                # device execution error, bundle mismatch): never a 4xx
                self._send(500, str(exc).encode(), "text/plain")
                return
            self._send(200, _npz_bytes(preds), "application/octet-stream")

    class Server(ThreadingHTTPServer):
        batching_front = front  # exposed for tests / embedding

        def server_close(self):
            if front is not None:
                front.close()
            super().server_close()

    return Server(("", port), Handler)


def bench(model: ServingModel, iters: int) -> Dict:
    batch = model.example_batch()
    model.predict(batch)  # warm (compile cache is already hot; transfers)
    times = []
    for _ in range(iters):
        start = time.perf_counter()
        model.predict(batch)
        times.append(time.perf_counter() - start)
    times.sort()
    bs = int(self_bs) if (self_bs := model.manifest.get("batch_size")) else 1
    return {
        "metric": "serve_latency_ms",
        "p50": round(times[len(times) // 2] * 1e3, 2),
        "p95": round(times[int(len(times) * 0.95)] * 1e3, 2),
        "clips_per_sec": round(bs / (sum(times) / len(times)), 1),
        "batch_size": bs,
        "iters": iters,
        "platform": model.platform,
        "serving_dtype": model.manifest.get("serving_dtype"),
    }


def main():
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("bundle", help="export bundle dir (tools/export.py)")
    parser.add_argument("--port", type=int, default=0, help="HTTP port")
    parser.add_argument("--bench", type=int, default=0, help="latency iters")
    parser.add_argument(
        "--platform", default=None, help="jax platform override (cpu/tpu)"
    )
    parser.add_argument(
        "--batch-window",
        type=float,
        default=0.0,
        help="micro-batching window in ms (0 = off): concurrent requests "
        "arriving within the window share one device execution",
    )
    args = parser.parse_args()

    model = ServingModel(args.bundle, platform=args.platform)
    if args.bench:
        print(json.dumps(bench(model, args.bench)))
    if args.port:
        server = make_server(model, args.port, batch_window_ms=args.batch_window)
        print(
            json.dumps(
                {"serving": args.bundle, "port": args.port, "platform": model.platform}
            )
        )
        server.serve_forever()


if __name__ == "__main__":
    main()
