"""Entry-point tests: inference, pruning_test, real-time streaming loop."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvc_tpu.config import from_dict
from rtvc_tpu.data.io import (latest_checkpoint, load_kd_student_params,
                              restore_checkpoint, save_checkpoint,
                              strip_distillation_heads)
from rtvc_tpu.tokenization import BertWordPieceTokenizer

from test_models import tiny_student


@pytest.fixture(scope="module")
def student_ckpt(tmp_path_factory):
    model = tiny_student(dropout=0.0, vocab_size=211)
    frames = jnp.zeros((1, 2, 64, 64, 3))
    y = jnp.array([[101, 5]], jnp.int32)
    from rtvc_tpu.models.student import StudentCandidateV1
    variables = model.init(jax.random.PRNGKey(0), frames, y,
                           method=StudentCandidateV1.full_init)
    run_dir = tmp_path_factory.mktemp("results") / "run" / "myrun"
    os.makedirs(run_dir, exist_ok=True)
    save_checkpoint(str(run_dir / "ckpt_00"), {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })
    return model, variables, str(run_dir)


def test_checkpoint_roundtrip(student_ckpt):
    model, variables, run_dir = student_ckpt
    path = latest_checkpoint(run_dir)
    assert path is not None and path.endswith("ckpt_00")
    tree = restore_checkpoint(path)
    a = jax.tree.leaves(variables["params"])
    b = jax.tree.leaves(tree["params"])
    assert len(a) == len(b)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_strip_distillation_heads(student_ckpt):
    model, variables, run_dir = student_ckpt
    stripped = strip_distillation_heads(dict(variables["params"]))
    for head in ("projector_0", "upsample", "project", "project_decoder"):
        assert head in variables["params"]
        assert head not in stripped
    assert "embed" in stripped


def test_inference_entry(student_ckpt, capsys):
    from rtvc_tpu.inference import inference

    model, variables, run_dir = student_ckpt
    config = from_dict({"logger": {"save_dir":
                                   os.path.dirname(os.path.dirname(run_dir))}})
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 64, 64, 3))
    caps = jnp.array([[101, 5, 6, 0], [101, 7, 0, 0]], jnp.int32)
    loader = [{"frames": frames, "caption": caps,
               "vid-id": ["a", "b"], "caption-id": [0, 1]}]
    tok = BertWordPieceTokenizer()
    preds = inference(config, loader, tok, "myrun", student=model, max_len=4)
    assert len(preds) == 2
    out = capsys.readouterr().out
    assert "GT:" in out and "Pred:" in out


def test_pruning_test_entry(student_ckpt, tmp_path, capsys):
    from rtvc_tpu.pruning import global_prune_params
    from rtvc_tpu.pruning_test import test as pruned_test

    model, variables, run_dir = student_ckpt
    pruned, _ = global_prune_params(variables["params"], 0.3)
    ckpt = tmp_path / "pruned_03"
    save_checkpoint(str(ckpt), {"params": pruned,
                                "batch_stats": variables.get("batch_stats", {})})
    config = from_dict({"logger": {"save_dir": str(tmp_path)}})
    frames = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 64, 64, 3))
    caps = jnp.array([[101, 5, 6, 0], [101, 7, 0, 0]], jnp.int32)
    loader = [{"frames": frames, "caption": caps,
               "vid-id": ["a", "b"], "caption-id": [0, 1]}]
    bleu = pruned_test(config, loader, BertWordPieceTokenizer(), str(ckpt),
                       student=model)
    assert np.isfinite(bleu)
    assert "sparsity" in capsys.readouterr().out


def test_shrink_frame_pixel_identity():
    """Host-side shrink+crop commutes with the device preprocess stage.

    shrink_frame ships 25% fewer bytes than the uncropped shrink; this
    pins that clip_preprocess(shrink+crop) == clip_preprocess(shrink) for
    large frames, and that sub-224 frames are passed through whole (the
    device upscale must see the full field of view)."""
    pytest.importorskip("cv2")
    import cv2

    from rtvc_tpu.ops.preprocess import clip_preprocess
    from rtvc_tpu.real_time_inference import shrink_frame

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)

    cropped = shrink_frame(frame)
    assert cropped.shape == (224, 224, 3)

    # uncropped reference path: shorter-edge-224 shrink only
    scale = 224 / 480
    size = (int(round(640 * scale)), 224)
    uncropped = cv2.resize(frame, size, interpolation=cv2.INTER_AREA)

    out_crop = np.asarray(clip_preprocess(jnp.asarray(cropped[None])))
    out_full = np.asarray(clip_preprocess(jnp.asarray(uncropped[None])))
    np.testing.assert_allclose(out_crop, out_full, rtol=0, atol=1e-5)

    # portrait orientation crops the height axis
    portrait = rng.integers(0, 255, size=(640, 480, 3), dtype=np.uint8)
    assert shrink_frame(portrait).shape == (224, 224, 3)

    # small frames ship whole (no host crop before a device upscale)
    small = rng.integers(0, 255, size=(180, 240, 3), dtype=np.uint8)
    assert shrink_frame(small).shape == (180, 240, 3)


@pytest.mark.slow
def test_realtime_streaming_headless(student_ckpt, tmp_path):
    cv2 = pytest.importorskip("cv2")
    from rtvc_tpu.real_time_inference import run_realtime

    # synthetic source video
    path = str(tmp_path / "stream.mp4")
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, 30, (64, 64))
    if not w.isOpened():
        pytest.skip("no mp4 codec")
    rng = np.random.default_rng(0)
    for i in range(120):
        w.write(rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8))
    w.release()

    # streaming preprocesses to 224px — init the student at that resolution
    model = tiny_student(dropout=0.0, vocab_size=211)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 6, 224, 224, 3)),
                           jnp.array([[101, 5]], jnp.int32))
    stats = run_realtime(source=path, student=model, variables=variables,
                         tokenizer=BertWordPieceTokenizer(), display=False,
                         max_captions=2, max_seconds=60)
    assert stats["captions"] >= 1
    assert stats["caption_p50_s"] > 0


def test_inference_entry_beam(student_ckpt):
    from rtvc_tpu.inference import inference

    model, variables, run_dir = student_ckpt
    config = from_dict({"logger": {"save_dir":
                                   os.path.dirname(os.path.dirname(run_dir))}})
    frames = jax.random.normal(jax.random.PRNGKey(4), (2, 2, 64, 64, 3))
    caps = jnp.array([[101, 5, 6, 0], [101, 7, 0, 0]], jnp.int32)
    loader = [{"frames": frames, "caption": caps,
               "vid-id": ["a", "b"], "caption-id": [0, 1]}]
    preds = inference(config, loader, BertWordPieceTokenizer(), "myrun",
                      student=model, max_len=5, beam_size=3)
    assert len(preds) == 2


def test_evaluate_entry(student_ckpt):
    """Standalone checkpoint scoring: the full COCO sweep the reference ran
    only inside training (model.py:1040-1060) is available on demand."""
    from rtvc_tpu.evaluate import evaluate_checkpoint

    model, variables, run_dir = student_ckpt
    config = from_dict({"logger": {"save_dir":
                                   os.path.dirname(os.path.dirname(run_dir))}})
    frames = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 64, 64, 3))
    caps = jnp.array([[101, 5, 6, 0], [101, 7, 0, 0]], jnp.int32)
    loader = [{"frames": frames, "caption": caps,
               "vid-id": ["a", "b"], "caption-id": [0, 1]}]
    tok = BertWordPieceTokenizer()
    ann = {"a": [tok.decode(np.asarray(caps[0]), skip_special_tokens=True)],
           "b": [tok.decode(np.asarray(caps[1]), skip_special_tokens=True)]}

    scores, outputs = evaluate_checkpoint(
        config, loader, tok, run_name="myrun", student=model,
        annotations=ann)
    assert set(scores) >= {"corpus_bleu4", "Bleu_1", "Bleu_4", "METEOR",
                           "ROUGE_L", "CIDEr"}
    assert all(np.isfinite(v) for v in scores.values())
    assert {o["image_id"] for o in outputs} == {"a", "b"}

    # explicit --ckpt path + beam decode; no annotations -> BLEU-4 only
    ckpt = latest_checkpoint(run_dir)
    s2, _ = evaluate_checkpoint(config, loader, tok, ckpt=ckpt,
                                student=model, beam_size=2)
    assert set(s2) == {"corpus_bleu4"} and np.isfinite(s2["corpus_bleu4"])
