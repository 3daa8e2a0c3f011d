"""AOT export tests (rtvc_tpu/export.py).

Pins the deployment-artifact contract: a bundle's exported programs
reproduce the live serving program token-for-token (same
``serving.make_caption_step`` by construction, verified by execution),
bucket padding is output-invariant, the no-params bundle form works, and
the exact-topology compiled-executable round trip skips retracing while
matching outputs.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu import export as export_lib
from rtvc_tpu.serving import make_caption_step

from test_models import tiny_student

WINDOW = 3
FRAME = (64, 64, 3)
MAX_LEN = 8


@pytest.fixture(scope="module")
def exported_student():
    model = tiny_student(dropout=0.0)
    frames = jnp.zeros((1, WINDOW, 224, 224, 3), jnp.float32)
    y = jnp.array([[model.cls_token_id, 5]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, y)
    return model, variables


def _windows(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(n, WINDOW) + FRAME).astype(np.uint8)


def _direct_tokens(model, variables, windows, beam=0):
    step = jax.jit(make_caption_step(model, max_len=MAX_LEN, beam=beam))
    return np.asarray(step(variables, jnp.asarray(windows)))


@pytest.mark.slow
def test_bundle_roundtrip_matches_live_program(exported_student, tmp_path):
    model, variables = exported_student
    out = str(tmp_path / "bundle")
    manifest = export_lib.save_bundle(
        out, model, variables, buckets=(1, 2, 4), window=WINDOW,
        frame_shape=FRAME, max_len=MAX_LEN)
    assert manifest["buckets"] == [1, 2, 4]
    assert set(manifest["programs"]) == {"1", "2", "4"}
    assert os.path.exists(os.path.join(out, export_lib.MANIFEST))

    cap = export_lib.load_bundle(out)  # params restored from the bundle
    for n in (1, 2, 4):
        w = _windows(n, seed=n)
        np.testing.assert_array_equal(
            cap.caption_tokens(w), _direct_tokens(model, variables, w))


def test_bucket_padding_is_output_invariant(exported_student, tmp_path):
    """A 3-row request runs in the 4-bucket; rows must equal direct B=3."""
    model, variables = exported_student
    out = str(tmp_path / "bundle")
    export_lib.save_bundle(out, model, variables, buckets=(4,),
                           window=WINDOW, frame_shape=FRAME, max_len=MAX_LEN)
    cap = export_lib.load_bundle(out)
    w = _windows(3, seed=7)
    assert cap.bucket_for(3) == 4
    got = cap.caption_tokens(w)
    assert got.shape[0] == 3
    np.testing.assert_array_equal(got, _direct_tokens(model, variables, w))


def test_bundle_without_params(exported_student, tmp_path):
    model, variables = exported_student
    out = str(tmp_path / "bundle")
    export_lib.save_bundle(out, model, variables, buckets=(2,),
                           window=WINDOW, frame_shape=FRAME,
                           max_len=MAX_LEN, save_params=False)
    assert not os.path.exists(os.path.join(out, export_lib.PARAMS_DIR))
    with pytest.raises(ValueError, match="no params"):
        export_lib.load_bundle(out)
    cap = export_lib.load_bundle(out, variables=variables)
    w = _windows(2, seed=3)
    np.testing.assert_array_equal(
        cap.caption_tokens(w), _direct_tokens(model, variables, w))


def test_beam_bundle(exported_student, tmp_path):
    model, variables = exported_student
    out = str(tmp_path / "bundle")
    export_lib.save_bundle(out, model, variables, buckets=(2,),
                           window=WINDOW, frame_shape=FRAME,
                           max_len=MAX_LEN, beam=2)
    cap = export_lib.load_bundle(out)
    assert cap.beam == 2
    w = _windows(2, seed=11)
    np.testing.assert_array_equal(
        cap.caption_tokens(w), _direct_tokens(model, variables, w, beam=2))


def test_loader_validates_shapes_and_buckets(exported_student, tmp_path):
    model, variables = exported_student
    out = str(tmp_path / "bundle")
    export_lib.save_bundle(out, model, variables, buckets=(1, 2),
                           window=WINDOW, frame_shape=FRAME, max_len=MAX_LEN)
    cap = export_lib.load_bundle(out)
    with pytest.raises(ValueError, match="exceeds largest"):
        cap.caption_tokens(_windows(3))
    with pytest.raises(ValueError, match="expected"):
        cap.caption_tokens(np.zeros((1, WINDOW, 32, 32, 3), np.uint8))
    # a future format version must be refused, not silently misread
    man_path = os.path.join(out, export_lib.MANIFEST)
    man = json.load(open(man_path))
    man["format_version"] = export_lib._FORMAT_VERSION + 1
    json.dump(man, open(man_path, "w"))
    with pytest.raises(ValueError, match="newer"):
        export_lib.load_bundle(out)


def test_exported_bytes_deserialize_standalone(exported_student, tmp_path):
    """The portable artifact loads through jax.export alone — no
    rtvc_tpu model classes touched on the consumer side."""
    model, variables = exported_student
    exported = export_lib.export_caption_program(
        model, variables, batch=2, window=WINDOW, frame_shape=FRAME,
        max_len=MAX_LEN)
    blob = exported.serialize()
    revived = jax.export.deserialize(blob)
    w = _windows(2, seed=5)
    np.testing.assert_array_equal(
        np.asarray(revived.call(variables, w)),
        _direct_tokens(model, variables, w))


def test_compiled_executable_roundtrip(exported_student, tmp_path):
    model, variables = exported_student
    path = str(tmp_path / "b2.jexec")
    export_lib.save_compiled(path, model, variables, batch=2, window=WINDOW,
                             frame_shape=FRAME, max_len=MAX_LEN)
    fn, meta = export_lib.load_compiled(path)
    assert meta["batch"] == 2 and meta["max_len"] == MAX_LEN
    w = _windows(2, seed=9)
    np.testing.assert_array_equal(
        np.asarray(fn(variables, jnp.asarray(w))),
        _direct_tokens(model, variables, w))


def test_save_compiled_survives_warm_compile_cache(exported_student,
                                                   tmp_path):
    """Regression: serialize() of an executable LOADED FROM jax's persistent
    compilation cache emits an incomplete payload (missing kernel
    registrations; execute-time "Buffer Definition Event: Function ... not
    found"). save_compiled must therefore compile with the cache disabled.
    Warm the cache with the exact program first, then export — the artifact
    must still execute correctly."""
    model, variables = exported_student
    w = _windows(2, seed=13)
    # warm: compile + run the identical program through the normal path
    # (populates the in-memory and persistent caches if enabled)
    ref = _direct_tokens(model, variables, w)
    path = str(tmp_path / "warm.jexec")
    export_lib.save_compiled(path, model, variables, batch=2, window=WINDOW,
                             frame_shape=FRAME, max_len=MAX_LEN)
    fn, _ = export_lib.load_compiled(path)
    np.testing.assert_array_equal(
        np.asarray(fn(variables, jnp.asarray(w))), ref)
    # the knob must be restored afterwards
    assert jax.config.jax_enable_compilation_cache is not None
