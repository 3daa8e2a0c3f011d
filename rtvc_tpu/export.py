"""AOT deployment artifacts: exported caption programs + compiled executables.

The reference's deployment story is pickling the entire torch module and
unpickling it at serving startup (reference src/real_time_inference.py:8-10,
``torch.load('results/student_model.pt')``) — which ties the serving host to
the full Python model codebase and re-pays module construction every start.
The TPU-native equivalent is ahead-of-time program export, in two strengths:

1. **Portable programs** (``jax.export``): each serving bucket's
   preprocess+decode program (``serving.make_caption_step`` — the exact
   function ``BatchCaptionServer`` jits) is lowered for explicit target
   platforms and serialized as versioned StableHLO. Loading needs jax only
   — none of the rtvc_tpu model code — and jax.export's calling-convention
   versioning gives a compatibility window across jax releases. The load
   site still pays one XLA compile per program (absorbed by the persistent
   compile cache ``rtvc_tpu.__init__`` enables).

2. **Exact-topology executables** (``jax.experimental.serialize_executable``):
   pickles the *compiled* XLA executable, so a serving restart on the same
   topology (same chip kind/count/runtime) skips tracing AND compilation —
   the cold-start killer for production restarts, where flagship bucket
   compiles take minutes cold (docs/PERF.md §4).

A bundle directory holds one portable program per serving bucket plus the
weights and a manifest::

    bundle/
      manifest.json       # buckets, window, frame shape, max_len, beam,
                          # platforms, param-tree summary
      program_b{B}.jexp   # jax.export bytes, one per bucket batch size
      params/             # orbax checkpoint of the serving variables

CLI (writes a bundle from a training checkpoint, random init if omitted)::

    python -m rtvc_tpu.export --out bundle/ [--ckpt results/run/x/ckpt_19]
        [--buckets 1,2,4,8] [--beam K] [--platforms tpu,cpu] [--compiled]
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"
PARAMS_DIR = "params"
_FORMAT_VERSION = 1

PyTree = Any


def _abstractify(tree: PyTree):
    import jax
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), tree)


def _frames_spec(batch: int, window: int, frame_shape: Sequence[int]):
    import jax
    return jax.ShapeDtypeStruct((batch, window) + tuple(frame_shape),
                                np.uint8)


def export_caption_program(student, variables: PyTree, *, batch: int,
                           window: int = 6,
                           frame_shape: Sequence[int] = (224, 224, 3),
                           max_len: int = 25, beam: int = 0,
                           platforms: Optional[Sequence[str]] = None):
    """Lower one serving bucket to a portable ``jax.export.Exported``.

    The exported function has the serving signature
    ``(variables, frames_u8[batch, window, *frame_shape] uint8) → tokens``
    with the param tree as a runtime argument (never an inline constant —
    docs/PERF.md §4). ``platforms=None`` targets the current backend;
    pass e.g. ``("tpu", "cpu")`` for a multi-platform artifact.
    """
    import jax

    from .serving import make_caption_step

    step = make_caption_step(student, max_len=max_len, beam=beam)
    return jax.export.export(jax.jit(step), platforms=platforms)(
        _abstractify(variables), _frames_spec(batch, window, frame_shape))


def save_bundle(out_dir: str, student, variables: PyTree, *,
                buckets: Sequence[int] = (1, 2, 4, 8), window: int = 6,
                frame_shape: Sequence[int] = (224, 224, 3),
                max_len: int = 25, beam: int = 0,
                platforms: Optional[Sequence[str]] = None,
                save_params: bool = True) -> Dict[str, Any]:
    """Write a deployment bundle: one exported program per bucket + params.

    Returns the manifest dict. ``save_params=False`` writes programs and
    manifest only (for weight-less program distribution — the loader then
    needs ``variables=`` passed explicitly).
    """
    buckets = tuple(sorted(set(int(b) for b in buckets)))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"buckets must be positive ints, got {buckets!r}")
    os.makedirs(out_dir, exist_ok=True)

    n_params = sum(int(np.prod(np.shape(p)))
                   for p in _tree_leaves(variables))
    manifest: Dict[str, Any] = {
        "format_version": _FORMAT_VERSION,
        "buckets": list(buckets),
        "window": int(window),
        "frame_shape": list(frame_shape),
        "max_len": int(max_len),
        "beam": int(beam),
        "platforms": list(platforms) if platforms else None,
        "n_params": n_params,
        "has_params": bool(save_params),
        "programs": {},
    }
    for b in buckets:
        exported = export_caption_program(
            student, variables, batch=b, window=window,
            frame_shape=frame_shape, max_len=max_len, beam=beam,
            platforms=platforms)
        name = f"program_b{b}.jexp"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exported.serialize())
        manifest["programs"][str(b)] = name

    if save_params:
        from .data.io import save_checkpoint
        save_checkpoint(os.path.join(out_dir, PARAMS_DIR), variables)

    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def _tree_leaves(tree: PyTree) -> List[Any]:
    import jax
    return jax.tree.leaves(tree)


class ExportedCaptioner:
    """Serve captions from a bundle directory — no model code required.

    Mirrors the ``BatchCaptionServer`` bucket policy (pad a request batch
    up to the smallest covering bucket, discard pad rows); exactness holds
    for the same reason it does there (rows are independent, the all-SEP
    early stop only runs longer — serving.py module docstring). Token
    rows come back un-truncated; pair with ``serving.truncate_at_sep`` +
    a tokenizer for text (kept out of this class so the loader stays
    model-code-free).
    """

    def __init__(self, path: str, variables: Optional[PyTree] = None):
        import jax

        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"bundle format {self.manifest['format_version']} is newer "
                f"than this loader ({_FORMAT_VERSION})")
        self.window = int(self.manifest["window"])
        self.frame_shape = tuple(self.manifest["frame_shape"])
        self.max_len = int(self.manifest["max_len"])
        self.beam = int(self.manifest["beam"])
        self.buckets = tuple(sorted(int(b)
                                    for b in self.manifest["buckets"]))
        self._programs = {}
        for b, name in self.manifest["programs"].items():
            with open(os.path.join(path, name), "rb") as f:
                self._programs[int(b)] = jax.export.deserialize(f.read())
        if variables is None:
            if not self.manifest.get("has_params", True):
                raise ValueError(
                    "bundle has no params/ — pass variables= explicitly")
            from .data.io import restore_checkpoint
            variables = restore_checkpoint(os.path.join(path, PARAMS_DIR))
        self.variables = variables

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        raise ValueError(
            f"batch {n} exceeds largest exported bucket {self.buckets[-1]}")

    def caption_tokens(self, windows: np.ndarray) -> np.ndarray:
        """``[B, window, H, W, 3]`` uint8 → ``[B, tokens]`` int32 rows."""
        windows = np.asarray(windows, np.uint8)
        if windows.ndim != 5 or windows.shape[1:] != \
                (self.window,) + self.frame_shape:
            raise ValueError(
                f"expected [B, {self.window}, {self.frame_shape}] uint8, "
                f"got {windows.shape}")
        n = windows.shape[0]
        b = self.bucket_for(n)
        if b != n:
            pad = np.zeros((b - n,) + windows.shape[1:], np.uint8)
            windows = np.concatenate([windows, pad], axis=0)
        out = np.asarray(self._programs[b].call(self.variables, windows))
        return out[:n]


def load_bundle(path: str,
                variables: Optional[PyTree] = None) -> ExportedCaptioner:
    return ExportedCaptioner(path, variables=variables)


# ---------------------------------------------------------------------------
# Exact-topology compiled executables (tracing- AND compile-free restarts)

def save_compiled(path: str, student, variables: PyTree, *, batch: int,
                  window: int = 6,
                  frame_shape: Sequence[int] = (224, 224, 3),
                  max_len: int = 25, beam: int = 0) -> None:
    """Compile one bucket on the CURRENT backend and pickle the executable.

    Loading with :func:`load_compiled` on the same topology skips both
    tracing and XLA compilation. The artifact is NOT portable across chip
    kinds/counts or runtime versions — that is what bundles are for.

    The artifact is VERIFIED before this function returns (deserialized
    and executed against the live compile's output). That guards against
    an XLA:CPU process-state bug root-caused 2026-08-18: once any
    executable has been *loaded from jax's persistent compilation cache*
    in a process, every later ``serialize_executable.serialize`` emits an
    incomplete payload (kernel functions deduplicated against the
    process-global registry; execute-time "Buffer Definition Event:
    Function ... not found") — even for executables compiled inside a
    cache-disabled window. TPU executables are self-contained and
    unaffected (verified warm-cache on v5e). When verification detects
    the poisoned form, the export transparently re-runs in a pristine
    spawn subprocess with the cache disabled from startup, then
    re-verifies. Regression-pinned by
    tests/test_export.py::test_save_compiled_survives_warm_compile_cache.
    """
    import jax

    want = _write_compiled(path, student, variables, batch=batch,
                           window=window, frame_shape=frame_shape,
                           max_len=max_len, beam=beam)
    try:
        _verify_compiled(path, variables, batch=batch, window=window,
                         frame_shape=frame_shape, want=want)
        return
    except jax.errors.JaxRuntimeError as e:
        if "Buffer Definition Event" not in str(e):
            raise
    # Poisoned serialize (XLA:CPU cache-dedup bug, docstring): redo in a
    # pristine subprocess where no cache entry has ever been loaded. The
    # worker leaves its own direct-execution output at <path>.want.npy so
    # the parent can verify without recompiling the program.
    _export_in_subprocess(path, student, variables, batch=batch,
                          window=window, frame_shape=frame_shape,
                          max_len=max_len, beam=beam)
    want_path = path + ".want.npy"
    want = np.load(want_path)
    os.unlink(want_path)
    _verify_compiled(path, variables, batch=batch, window=window,
                     frame_shape=frame_shape, want=want)


def _probe_input(batch: int, window: int, frame_shape: Sequence[int]):
    """Deterministic uint8 probe batch shared by write and verify."""
    shape = (batch, window) + tuple(frame_shape)
    return (np.arange(int(np.prod(shape))) % 251).reshape(shape) \
        .astype(np.uint8)


def _write_compiled(path: str, student, variables: PyTree, *, batch: int,
                    window: int, frame_shape: Sequence[int], max_len: int,
                    beam: int) -> np.ndarray:
    """Compile + serialize + pickle one bucket. Returns the compiled
    program's own output on the deterministic probe input — the reference
    the artifact is verified against (no second compile needed)."""
    import jax
    from jax.experimental import serialize_executable

    from .serving import make_caption_step

    step = jax.jit(make_caption_step(student, max_len=max_len, beam=beam))
    # Cache-disabled window: don't LOAD this program from the persistent
    # cache (a cache-loaded executable can't serialize at all per jax —
    # and on XLA:CPU the load itself poisons the process, see docstring).
    prev_cache = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        compiled = step.lower(
            _abstractify(variables),
            _frames_spec(batch, window, frame_shape)).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", prev_cache)
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    # Record how many devices the executable spans: deserialize_and_load
    # defaults execution_devices to ALL of the backend's devices, which
    # breaks a 1-device executable on a multi-device host (it would expect
    # n-sharded args). load_compiled re-binds to the first n devices.
    in_shardings, _ = compiled.input_shardings
    devs = set()
    for s in in_shardings:
        devs |= set(getattr(s, "device_set", ()))
    with open(path, "wb") as f:
        pickle.dump({"payload": payload, "in_tree": in_tree,
                     "out_tree": out_tree, "batch": int(batch),
                     "window": int(window),
                     "frame_shape": tuple(frame_shape),
                     "max_len": int(max_len), "beam": int(beam),
                     "n_devices": max(1, len(devs))}, f)
    probe = _probe_input(batch, window, frame_shape)
    return np.asarray(compiled(variables, probe))


def _verify_compiled(path: str, variables: PyTree, *, batch: int,
                     window: int, frame_shape: Sequence[int],
                     want: np.ndarray) -> None:
    """Execute the artifact on the probe and compare against the live
    program's output (produced by the very executable that was
    serialized, so no re-compile here)."""
    import jax.numpy as jnp

    fn, _ = load_compiled(path)
    probe = jnp.asarray(_probe_input(batch, window, frame_shape))
    got = np.asarray(fn(variables, probe))
    if not np.array_equal(got, want):
        raise RuntimeError(
            f"compiled-executable artifact {path} failed verification: "
            "deserialized output differs from the live program")


def _subprocess_export_worker(blob_path: str, out_path: str,
                              platform: str) -> None:
    """Spawn-subprocess entry: export with a never-touched compile cache.

    Pins the parent's platform explicitly — env-level JAX_PLATFORMS=cpu
    loses the backend election to the axon TPU plugin, so a child spawned
    from a CPU-forced test process would otherwise grab the TPU tunnel and
    emit an artifact for the wrong backend. Leaves the direct-execution
    probe output at <out_path>.want.npy for the parent's verification."""
    import jax

    jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_compilation_cache", False)
    with open(blob_path, "rb") as f:
        student, variables, kwargs = pickle.load(f)
    want = _write_compiled(out_path, student, variables, **kwargs)
    np.save(out_path + ".want.npy", want)


def _export_in_subprocess(path: str, student, variables: PyTree,
                          **kwargs) -> None:
    import multiprocessing
    import tempfile

    import jax

    host_vars = jax.tree.map(np.asarray, variables)
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        pickle.dump((student, host_vars, kwargs), f)
        blob_path = f.name
    try:
        ctx = multiprocessing.get_context("spawn")
        proc = ctx.Process(target=_subprocess_export_worker,
                           args=(blob_path, path, jax.default_backend()))
        proc.start()
        proc.join()
        if proc.exitcode != 0:
            raise RuntimeError(
                f"subprocess export failed (exit {proc.exitcode})")
    finally:
        os.unlink(blob_path)


def load_compiled(path: str):
    """Unpickle a :func:`save_compiled` artifact → (callable, meta dict).

    The callable has the serving signature ``(variables, frames_u8)`` and
    runs the pre-compiled executable directly (no trace, no compile).
    """
    import jax
    from jax.experimental import serialize_executable

    with open(path, "rb") as f:
        blob = pickle.load(f)
    n = int(blob.get("n_devices", 1))
    devices = jax.devices()[:n]
    if len(devices) < n:
        raise ValueError(
            f"executable spans {n} devices; this host exposes "
            f"{len(devices)} — re-export for this topology")
    fn = serialize_executable.deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=devices)
    meta = {k: blob[k] for k in
            ("batch", "window", "frame_shape", "max_len", "beam")}
    return fn, meta


# ---------------------------------------------------------------------------
# CLI

def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Export AOT caption-serving artifacts (bundle of "
                    "portable programs, optionally a compiled executable)")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (data/io.py layout); random init "
                        "if omitted")
    p.add_argument("--buckets", default="1,2,4,8")
    p.add_argument("--max-len", type=int, default=25)
    p.add_argument("--beam", type=int, default=0)
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--compiled", action="store_true",
                   help="also pickle the largest bucket's compiled "
                        "executable for this exact topology")
    a = p.parse_args(argv)

    import jax

    from .real_time_inference import WINDOW
    from .serving import build_serving_student

    # the one shared model-load block (serving.py) — exported programs and
    # served programs can't drift through loading semantics
    student, variables = build_serving_student(a.ckpt)

    buckets = tuple(int(b) for b in a.buckets.split(","))
    platforms = tuple(a.platforms.split(",")) if a.platforms else None
    manifest = save_bundle(
        a.out, student, variables, buckets=buckets, window=WINDOW,
        max_len=a.max_len, beam=a.beam, platforms=platforms)
    print(f"bundle: {a.out} ({len(manifest['programs'])} programs, "
          f"{manifest['n_params'] / 1e6:.1f}M params)")
    if a.compiled:
        top = max(buckets)  # largest bucket regardless of CLI order
        path = os.path.join(a.out, f"compiled_b{top}.jexec")
        save_compiled(path, student, variables, batch=top,
                      window=WINDOW, max_len=a.max_len, beam=a.beam)
        print(f"compiled executable: {path} "
              f"(topology-locked to {jax.default_backend()})")


if __name__ == "__main__":
    main()
