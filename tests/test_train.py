"""Training-loop tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rtvc_tpu.config import Config
from rtvc_tpu.distill import LossWeights
from rtvc_tpu.models.clip_vit import CLIPViTConfig
from rtvc_tpu.models.git_teacher import GITConfig, GITTeacher
from rtvc_tpu.models.student import StudentCandidateV1
from rtvc_tpu.models.tinyvit import TinyViTConfig
from rtvc_tpu.parallel.mesh import make_mesh, place_params, replicate, shard_batch
from rtvc_tpu.train import (PlateauScheduler, TrainState, create_train_state,
                            make_train_step, train)

ENC = TinyViTConfig(embed_dims=(8, 16, 24, 32), depths=(1, 1, 1, 1),
                    num_heads=(1, 2, 2, 2), window_sizes=(4, 4, 4, 4),
                    drop_path_rate=0.0)
# 64px test frames satisfy both towers (TinyViT /32, CLIP patch 16 → 4x4
# grid) — keeps single-core CPU compile times tractable
CLIP64 = CLIPViTConfig(image_size=64, patch_size=16, width=32, layers=2,
                       heads=2)
GIT64 = GITConfig(vocab_size=173, hidden_size=16, num_layers=2,
                  attention_heads=2, feedforward_size=32,
                  visual_feature_size=32, max_caption_length=64,
                  num_image_with_embedding=2, clip=CLIP64)


def tiny_pair():
    student = StudentCandidateV1(
        d_model=32, n_head=4, d_ffn=64, dropout=0.1, num_decoder_layers=2,
        vocab_size=173, max_pos_len=64, encoder_config=ENC,
        teacher_visual_dim=32, teacher_num_tokens=2 * 17, teacher_hidden=16)
    teacher = GITTeacher(GIT64)
    return student, teacher


def synth_batch(b=8, f=2, t=6, vocab=173, seed=0):
    rng = np.random.default_rng(seed)
    frames = rng.normal(size=(b, f, 64, 64, 3)).astype(np.float32)
    caps = np.zeros((b, t), np.int32)
    caps[:, 0] = 101
    lens = rng.integers(2, t, size=b)
    for i in range(b):
        caps[i, 1:lens[i]] = rng.integers(3, vocab, size=lens[i] - 1)
    return {"frames": jnp.asarray(frames), "caption": jnp.asarray(caps)}


@pytest.fixture(scope="module")
def setup():
    student, teacher = tiny_pair()
    batch = synth_batch()
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    state = create_train_state(student, jax.random.PRNGKey(0), batch, tx)
    tvars = teacher.init(jax.random.PRNGKey(1), batch["frames"][:1],
                         batch["caption"][:1])
    return student, teacher, batch, tx, state, tvars


@pytest.mark.slow
def test_train_step_runs_and_learns(setup):
    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False)
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(6):
        state, m = step(state, tvars, batch, rng)
        losses.append(float(m["total"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(m["grad_norm"]))
    assert losses[-1] < losses[0]  # overfits a fixed batch
    assert int(state.step) == 6


@pytest.mark.slow
def test_train_step_all_losses_enabled(setup):
    student, teacher, batch, tx, state, tvars = setup
    weights = LossWeights(kl=1, ce=1, fmap=1, final_enc=1, decoder=1)
    step = make_train_step(student, teacher, tx, weights, donate=False)
    state, m = step(state, tvars, batch, jax.random.PRNGKey(3))
    for key in ("kl", "ce", "fmap", "final_enc", "decoder", "total"):
        assert key in m and np.isfinite(float(m[key])), key


@pytest.mark.slow
def test_train_step_ce_teacher_loss(setup):
    """Loss 5 wired end-to-end: the step runs the teacher's beam search
    in-graph and trains on its generated tokens; the loss dict must contain
    ce_teacher (guarding the silent-skip) and decrease when overfitting."""
    student, teacher, batch, tx, state, tvars = setup
    weights = LossWeights(ce_teacher=1.0)
    step = make_train_step(student, teacher, tx, weights, donate=False,
                           kd_max_steps=8, kd_beam_size=2)
    losses = []
    for _ in range(5):
        state, m = step(state, tvars, batch, jax.random.PRNGKey(6))
        assert "ce_teacher" in m
        losses.append(float(m["ce_teacher"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]  # student moves toward the teacher tokens


@pytest.mark.slow
def test_train_step_beam_consensus_kd(setup):
    """kd_source='beam_consensus': the KL distills against per-word
    best-beam teacher logit rows (reference teacher.forward path)."""
    student, teacher, batch, tx, state, tvars = setup
    weights = LossWeights(kd_source="beam_consensus")
    step = make_train_step(student, teacher, tx, weights, donate=False,
                           kd_max_steps=8, kd_beam_size=2)
    state, m = step(state, tvars, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["kl"])) and np.isfinite(float(m["total"]))
    state, m2 = step(state, tvars, batch, jax.random.PRNGKey(7))
    assert float(m2["total"]) < float(m["total"])


@pytest.mark.slow
def test_data_parallel_sharded_step(setup):
    student, teacher, batch, tx, state, tvars = setup
    mesh = make_mesh((-1, 1))
    assert mesh.shape["dp"] == 8
    state = TrainState(params=place_params(state.params, mesh),
                       batch_stats=replicate(state.batch_stats, mesh),
                       opt_state=jax.device_put(state.opt_state),
                       step=state.step)
    tvars_r = replicate(tvars, mesh)
    sharded = shard_batch(batch, mesh)
    # each dp shard holds B/8 rows
    assert sharded["frames"].sharding.num_devices == 8
    step = make_train_step(student, teacher, tx, donate=False)
    new_state, m = step(state, tvars_r, sharded, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["total"]))
    # params stay replicated after the update
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device(setup):
    """The dp-sharded step must produce the same loss as unsharded."""
    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False)
    rng = jax.random.PRNGKey(5)
    with jax.default_matmul_precision("highest"):
        _, m_single = step(state, tvars, batch, rng)
        mesh = make_mesh((-1, 1))
        state_r = TrainState(params=place_params(state.params, mesh),
                             batch_stats=replicate(state.batch_stats, mesh),
                             opt_state=jax.device_put(state.opt_state),
                             step=state.step)
        _, m_shard = step(state_r, replicate(tvars, mesh),
                          shard_batch(batch, mesh), rng)
    assert abs(float(m_single["total"]) - float(m_shard["total"])) < 1e-3


def test_plateau_scheduler():
    s = PlateauScheduler(lr=1.0, factor=0.5, patience=2, min_lr=0.01)
    assert s.update(1.0) == 1.0   # improvement (best=inf → 1.0)
    assert s.update(0.5) == 1.0   # improvement
    for v in (0.6, 0.6):          # 2 bad epochs = patience, not yet over
        assert s.update(v) == 1.0
    assert s.update(0.6) == 0.5   # 3rd bad epoch > patience → halve
    s2 = PlateauScheduler(lr=0.02, factor=0.5, patience=0, min_lr=0.015)
    s2.update(1.0)
    assert s2.update(2.0) == 0.015  # clipped at min_lr


@pytest.mark.slow
def test_full_train_orchestration(tmp_path):
    """One-epoch end-to-end train(): loop, eval, transcripts, checkpoints."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4,
                  "trainer": {"max_epochs": 1}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def loader(seed):
        return [synth_batch(b=4, seed=seed) | {"vid-id": [f"v{i}" for i in range(4)],
                                               "caption-id": list(range(4))}]

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    state, history = train(config, loader(0), loader(1), loader(2), tok,
                           run_name="t", student=student, teacher=teacher,
                           teacher_vars=tvars, max_epochs=1)
    assert len(history["train_loss"]) == 1
    assert np.isfinite(history["train_loss"][0])
    run_dir = tmp_path / "run" / "t"
    assert (run_dir / "_results_and_metrics.txt").exists()
    assert (run_dir / "scalars.jsonl").exists()
    assert any(p.name.startswith("ckpt") for p in run_dir.iterdir())
    text = (run_dir / "_results_and_metrics.txt").read_text()
    assert "Validation Results" in text and "BLEU@4" in text


@pytest.mark.slow
def test_ragged_batch_trimmed_not_replicated(tmp_path):
    """A batch not divisible by dp must be trimmed to a dp multiple (and
    logged), never silently re-placed as replicated (VERDICT r1 weak #5)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 6, "trainer": {"max_epochs": 1}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()
    mesh = make_mesh((4, 1))

    def loader(seed, b):
        return [synth_batch(b=b, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(b)],
            "caption-id": list(range(b))}]

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    # train batch of 6 on dp=4 → trimmed to 4, stays dp-sharded
    _, history = train(config, loader(0, 6) + loader(3, 4),
                       loader(1, 4), loader(2, 4), tok,
                       run_name="rag", student=student, teacher=teacher,
                       teacher_vars=tvars, mesh=mesh, max_epochs=1)
    assert np.isfinite(history["train_loss"][0])
    text = (tmp_path / "run" / "rag" / "_results_and_metrics.txt").read_text()
    assert "trimming ragged batch 6 -> 4" in text
    # a batch smaller than dp is a hard error, never a silent re-placement
    with pytest.raises(ValueError, match="cannot be split over dp"):
        train(config, loader(0, 2), loader(1, 4), loader(2, 4), tok,
              run_name="rag2", student=student, teacher=teacher,
              teacher_vars=tvars, mesh=mesh, max_epochs=1)


@pytest.mark.slow
def test_ragged_batch_trimmed_for_grad_accum(tmp_path):
    """A tail batch not divisible by grad_accum must be trimmed by the
    loop (logged), never die on the step's trace-time divisibility error
    (code-review finding, round 3)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4, "grad_accum_steps": 2,
                  "trainer": {"max_epochs": 1}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def loader(seed, b):
        return [synth_batch(b=b, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(b)],
            "caption-id": list(range(b))}]

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    # a 3-row tail on grad_accum=2 (dp=1) → trimmed to 2, not a crash
    _, history = train(config, loader(0, 4) + loader(3, 3),
                       loader(1, 4), loader(2, 4), tok,
                       run_name="ragacc", student=student, teacher=teacher,
                       teacher_vars=tvars, mesh=make_mesh((1, 1)),
                       max_epochs=1)
    assert np.isfinite(history["train_loss"][0])
    text = (tmp_path / "run" / "ragacc" / "_results_and_metrics.txt").read_text()
    assert "trimming ragged batch 3 -> 2" in text


@pytest.mark.slow
def test_onecycle_scheduler(tmp_path):
    """cfg.train.scheduler='onecycle' — the reference CONSTRUCTED a
    OneCycleLR(max_lr=0.01, total_steps=epochs*steps) its
    configure_optimizers never returned (model.py:1110-1113, dead code);
    here it is a working in-graph schedule. The lr logged at the end of
    epoch 1 (mid-cycle, near peak) must exceed the lr at the end of the
    final epoch (annealed toward ~peak/25e4)."""
    import json

    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4, "scheduler": "onecycle",
                  "onecycle_max_lr": 0.01, "trainer": {"max_epochs": 2}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def loader(seed):
        return [synth_batch(b=4, seed=seed + i) | {
            "vid-id": [f"v{j}" for j in range(4)],
            "caption-id": list(range(4))} for i in range(2)]

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    _, history = train(config, loader(0), loader(10), loader(20), tok,
                       run_name="oc", student=student, teacher=teacher,
                       teacher_vars=tvars, max_epochs=2)
    assert all(np.isfinite(v) for v in history["train_loss"])
    rows = [json.loads(l) for l in
            (tmp_path / "run" / "oc" / "scalars.jsonl").read_text()
            .splitlines()]
    lrs = [r["lr"] for r in rows if "lr" in r]
    assert len(lrs) == 2
    assert lrs[0] > lrs[1] > 0          # mid-cycle > annealed tail
    assert lrs[0] <= 0.01 + 1e-9        # never above max_lr

    # unsized loaders can't fix total_steps — a clear error, not a hang
    def gen():
        yield from loader(0)

    with pytest.raises(ValueError, match="sized train_loader"):
        train(config, gen(), loader(10), loader(20), tok, run_name="oc2",
              student=student, teacher=teacher, teacher_vars=tvars,
              max_epochs=2)


@pytest.mark.slow
def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-epoch → full train state saved to ckpt_preempt, clean
    early return (no test eval), handlers restored; resuming from the
    checkpoint continues the step counter. The reference had no
    preemption story (SURVEY §5 failure handling: none)."""
    import os as _os
    import signal as _signal

    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.io import checkpoint_meta
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4,
                  "trainer": {"max_epochs": 3}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def eval_loader(seed):
        return [synth_batch(b=4, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(4)],
            "caption-id": list(range(4))}]

    class SigTermLoader:
        """Delivers SIGTERM to our own process before yielding batch 2 —
        simulating a reclaim notice arriving mid-epoch."""

        def __iter__(self):
            for i in range(4):
                if i == 2:
                    _os.kill(_os.getpid(), _signal.SIGTERM)
                yield synth_batch(b=4, seed=i) | {
                    "vid-id": [f"v{j}" for j in range(4)],
                    "caption-id": list(range(4))}

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    prev_handler = _signal.getsignal(_signal.SIGTERM)
    state, history = train(config, SigTermLoader(), eval_loader(1),
                           eval_loader(2), tok, run_name="pre",
                           student=student, teacher=teacher,
                           teacher_vars=tvars, max_epochs=3)
    assert history["preempted"] is True
    assert history["test_loss"] is None          # no test decode on reclaim
    assert int(state.step) == 2                  # batches 0,1 ran; 2 did not
    assert _signal.getsignal(_signal.SIGTERM) is prev_handler
    ckpt = str(tmp_path / "run" / "pre" / "ckpt_preempt")
    meta = checkpoint_meta(ckpt)
    assert meta["preempted"] is True and meta["steps_into_epoch"] == 2
    text = (tmp_path / "run" / "pre" / "_results_and_metrics.txt").read_text()
    assert "SIGTERM: checkpointed" in text

    # resume: step counter continues from the preempted state
    state2, hist2 = train(config, eval_loader(3), eval_loader(1),
                          eval_loader(2), tok, run_name="pre_resume",
                          student=student, teacher=teacher,
                          teacher_vars=tvars, max_epochs=1,
                          resume_from=ckpt)
    assert not hist2.get("preempted")
    assert int(state2.step) == 3                 # 2 resumed + 1 new batch
    assert np.isfinite(hist2["train_loss"][0])


def test_checkpoint_resume_roundtrip(tmp_path, setup):
    """Full train-state save/restore → training continues identically."""
    from rtvc_tpu.data.io import restore_checkpoint, save_checkpoint

    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False)
    state1, _ = step(state, tvars, batch, jax.random.PRNGKey(9))
    save_checkpoint(str(tmp_path / "ck"), {
        "params": state1.params, "batch_stats": state1.batch_stats,
        "opt_state": state1.opt_state, "step": state1.step})
    tree = restore_checkpoint(str(tmp_path / "ck"),
                              target={"params": state1.params,
                                      "batch_stats": state1.batch_stats,
                                      "opt_state": state1.opt_state,
                                      "step": state1.step})
    resumed = TrainState(params=tree["params"],
                         batch_stats=tree["batch_stats"],
                         opt_state=tree["opt_state"], step=tree["step"])
    assert int(resumed.step) == 1
    _, m_a = step(state1, tvars, batch, jax.random.PRNGKey(10))
    _, m_b = step(resumed, tvars, batch, jax.random.PRNGKey(10))
    assert abs(float(m_a["total"]) - float(m_b["total"])) < 1e-5


def test_async_checkpoint_saver(tmp_path):
    """Background saves round-trip exactly, run in order (on_done fires
    after the write), and errors re-raise on the caller's thread."""
    from rtvc_tpu.data.io import AsyncCheckpointSaver, restore_checkpoint

    saver = AsyncCheckpointSaver()
    pruned = []
    tree1 = {"params": {"w": np.arange(6.0).reshape(2, 3)}, "step": 1}
    tree2 = {"params": {"w": np.arange(6.0).reshape(2, 3) * 2}, "step": 2}
    saver.save(str(tmp_path / "ck1"), tree1,
               on_done=lambda: pruned.append("ck1"))
    # queuing a second save joins the first — ck1 must be fully written
    saver.save(str(tmp_path / "ck2"), tree2,
               on_done=lambda: pruned.append("ck2"))
    assert pruned == ["ck1"]
    saver.wait()
    assert pruned == ["ck1", "ck2"]
    got1 = restore_checkpoint(str(tmp_path / "ck1"))
    got2 = restore_checkpoint(str(tmp_path / "ck2"))
    np.testing.assert_array_equal(got1["params"]["w"],
                                  tree1["params"]["w"])
    np.testing.assert_array_equal(got2["params"]["w"],
                                  tree2["params"]["w"])
    assert int(got2["step"]) == 2

    # a failing write surfaces on the next wait(), not silently
    class Boom:  # np.asarray(tree leaf) raises inside the worker
        def __array__(self):
            raise RuntimeError("disk full")
    saver.save(str(tmp_path / "ck3"), {"x": Boom()})
    with pytest.raises(RuntimeError, match="disk full"):
        saver.wait()
    # and the saver is reusable afterwards
    saver.save(str(tmp_path / "ck4"), {"step": 4})
    saver.wait()
    assert int(restore_checkpoint(str(tmp_path / "ck4"))["step"]) == 4


def test_checkpoint_meta_sidecar_and_gelu_override(tmp_path):
    """save_checkpoint(meta=...) writes a sidecar that survives restore,
    pruning carries it forward, and student_matching_checkpoint rebuilds
    the student with the RECORDED activation instead of the config default
    (erf-trained weights must never silently run under tanh GELU)."""
    from rtvc_tpu.config import cfg
    from rtvc_tpu.data.io import (checkpoint_meta, restore_checkpoint,
                                  save_checkpoint)
    from rtvc_tpu.models.student import student_matching_checkpoint

    path = str(tmp_path / "ck")
    save_checkpoint(path, {"params": {"w": np.ones(3)}},
                    meta={"gelu_approximate": False})
    assert checkpoint_meta(path) == {"gelu_approximate": False}
    # the orbax tree itself is unchanged (restore-with-target keeps working)
    assert set(restore_checkpoint(path).keys()) == {"params"}

    assert cfg.student.gelu_approximate is True  # training default
    student = student_matching_checkpoint(cfg, path)
    assert student.encoder_config.gelu_approximate is False  # meta wins
    # no sidecar -> config wins (pre-meta checkpoints behave as before)
    save_checkpoint(str(tmp_path / "old"), {"params": {"w": np.ones(3)}})
    student = student_matching_checkpoint(cfg, str(tmp_path / "old"))
    assert student.encoder_config.gelu_approximate is True

    # the pruning sweep copies the sidecar to its output checkpoints
    from rtvc_tpu import pruning
    pruning.main(["--ckpt", path, "--out_dir", str(tmp_path / "pr"),
                  "--ratios", "0.5"])
    assert checkpoint_meta(
        str(tmp_path / "pr" / "pruned_0.5")) == {"gelu_approximate": False}


def test_cache_replay_feed_reaps_producer_on_abandonment(tmp_path):
    """Abandoning the feed mid-epoch (train-step exception) must not leave
    the producer thread blocked on a full queue forever."""
    import threading
    import time as _time

    from rtvc_tpu.data.teacher_cache import CacheReplayFeed, \
        TeacherLogitsCache

    cache = TeacherLogitsCache(str(tmp_path / "tc"))
    batches = [{"vid-id": [f"v{i}"], "caption-id": [i],
                "frames": np.zeros((1, 2, 8, 8, 3), np.float32),
                "caption": np.zeros((1, 4), np.int32)} for i in range(16)]
    feed = CacheReplayFeed(batches, cache, depth=2)
    it = iter(feed)
    assert "_cache_keys" in next(it)
    it.close()  # generator abandoned -> finally must reap the producer
    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.name == "cache-replay-producer" and t.is_alive()]
        if not leaked:
            break
        _time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"

    # and normal exhaustion still yields every batch exactly once
    seen = [b["_cache_keys"][0] for b in CacheReplayFeed(batches, cache,
                                                         depth=2)]
    assert len(seen) == 16 and len(set(seen)) == 16


def test_train_resume_from(tmp_path):
    """train(resume_from=...) restores the full state and continues."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.io import latest_checkpoint
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4, "trainer": {"max_epochs": 1}},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def loader(seed):
        return [synth_batch(b=4, seed=seed) | {"vid-id": [f"v{i}" for i in range(4)],
                                               "caption-id": list(range(4))}]

    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"], synth_batch(b=1)["caption"])
    state1, _ = train(config, loader(0), loader(1), loader(2), tok,
                      run_name="r1", student=student, teacher=teacher,
                      teacher_vars=tvars, max_epochs=1)
    ckpt = latest_checkpoint(str(tmp_path / "run" / "r1"))
    assert ckpt is not None
    state2, _ = train(config, loader(0), loader(1), loader(2), tok,
                      run_name="r2", student=student, teacher=teacher,
                      teacher_vars=tvars, max_epochs=1, resume_from=ckpt)
    assert int(state2.step) == int(state1.step) + 1  # continued, not reset


def test_teacher_cache_roundtrip(tmp_path):
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache

    cache = TeacherLogitsCache(str(tmp_path / "tc"))
    keys = [cache.key("vid1", 7), cache.key("vid2", 9)]
    assert cache.get_batch(keys) is None  # cold miss
    logits = np.random.default_rng(0).normal(size=(2, 4, 11)).astype(np.float32)
    cache.put_batch(keys, logits)
    got = cache.get_batch(keys)
    np.testing.assert_array_equal(got, logits)
    # partial miss → None (whole batch recomputes, one step signature)
    assert cache.get_batch([keys[0], cache.key("vid3", 1)]) is None
    assert cache.stats()["hits"] == 2


def test_teacher_cache_eviction(tmp_path):
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache

    row_bytes = 4 * 11 * 4
    cache = TeacherLogitsCache(str(tmp_path / "tc"),
                               max_bytes=3 * (row_bytes + 128))
    for i in range(6):
        cache.put_batch([cache.key("v", i)],
                        np.zeros((1, 4, 11), np.float32))
    remaining = sum(cache.get_batch([cache.key("v", i)]) is not None
                    for i in range(6))
    assert remaining < 6  # oldest entries evicted
    assert cache.get_batch([cache.key("v", 5)]) is not None  # newest kept


@pytest.mark.slow
def test_train_with_teacher_cache_matches_uncached(tmp_path):
    """Caching must not change training: two 2-epoch runs (cached vs live
    teacher) produce identical loss histories, and epoch 2 is all hits."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer()

    def loader(seed):
        return [synth_batch(b=4, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(4)],
            "caption-id": list(range(4))}]

    def run(cache):
        student, teacher = tiny_pair()
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / ("c" if cache else "n"))},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "trainer": {"max_epochs": 2}},
            "wandb": {"mode": "disabled"},
        })
        tvars = teacher.init(jax.random.PRNGKey(1), synth_batch(b=1)["frames"],
                             synth_batch(b=1)["caption"])
        _, hist = train(config, loader(0), loader(1), loader(2), tok,
                        run_name="x", student=student, teacher=teacher,
                        teacher_vars=tvars, max_epochs=2,
                        teacher_cache=cache)
        return hist

    cache = TeacherLogitsCache(str(tmp_path / "tcache"))
    hist_cached = run(cache)
    hist_live = run(None)
    np.testing.assert_allclose(hist_cached["train_loss"],
                               hist_live["train_loss"], rtol=1e-5)
    # epoch 1: 4 misses; epoch 2: 4 hits (fixed vid→caption pairing)
    assert cache.stats()["hits"] >= 4 and cache.stats()["misses"] >= 4


def test_external_logits_rejects_activation_losses():
    student, teacher = tiny_pair()
    tx = optax.adam(1e-3)
    with pytest.raises(ValueError, match="caching"):
        make_train_step(student, teacher, tx, LossWeights(fmap=1.0),
                        external_teacher_logits=True)


@pytest.mark.slow
def test_evaluate_with_beam_size(tmp_path):
    """eval_beam_size > 0 routes evaluation through the student's beam
    search (ROADMAP #13; the reference never evaluated with beam)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer
    from rtvc_tpu.train import evaluate
    from rtvc_tpu.utils.logging import RunLogger

    student, _ = tiny_pair()
    batch = synth_batch(b=2, seed=0) | {"vid-id": ["v0", "v1"],
                                        "caption-id": [0, 1]}
    variables = student.init(jax.random.PRNGKey(0), batch["frames"],
                             batch["caption"], method=student.full_init)
    tok = BertWordPieceTokenizer()
    logger = RunLogger(str(tmp_path), "beam_eval", config_dump={},
                       use_wandb=False)
    bleu_b, out_b = evaluate(student, variables, [batch], tok, logger, 0,
                             "Validation", verbose=False, beam_size=2)
    bleu_g, out_g = evaluate(student, variables, [batch], tok, logger, 0,
                             "Validation", verbose=False, beam_size=0)
    assert len(out_b) == 2 and len(out_g) == 2
    assert np.isfinite(bleu_b) and np.isfinite(bleu_g)


def test_multihost_host_batch_slice():
    from rtvc_tpu.parallel import host_batch_slice

    assert host_batch_slice(32, 0, 4) == (0, 8)
    assert host_batch_slice(32, 3, 4) == (24, 32)
    with pytest.raises(ValueError):
        host_batch_slice(30, 0, 4)


def test_multihost_shard_host_local_single_process():
    """world_size=1 path: shard_host_local_batch == shard_batch placement."""
    from rtvc_tpu.parallel import make_mesh, shard_host_local_batch

    mesh = make_mesh((8, 1), ("dp", "tp"))
    batch = {"frames": np.ones((8, 2, 8, 8, 3), np.float32),
             "caption": np.zeros((8, 5), np.int32)}
    placed = shard_host_local_batch(batch, mesh)
    assert placed["frames"].sharding.spec[0] == "dp"
    assert placed["frames"].shape == (8, 2, 8, 8, 3)


def test_initialize_distributed_single_host_noop():
    from rtvc_tpu.parallel import initialize_distributed

    assert initialize_distributed() is False  # sandbox: one host, no env


def test_teacher_cache_topk_roundtrip(tmp_path):
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache, densify_topk

    cache = TeacherLogitsCache(str(tmp_path), top_k=4)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 16)).astype(np.float32)
    keys = [cache.key("v0", 0), cache.key("v1", 1)]
    cache.put_batch(keys, logits)
    got = cache.get_batch(keys)
    assert got is not None
    vals, idx = got
    assert vals.shape == (2, 5, 4) and idx.shape == (2, 5, 4)
    # stored pairs are exactly the top-4 of each row
    for b in range(2):
        for t in range(5):
            want = set(np.argsort(logits[b, t])[-4:])
            assert set(idx[b, t].tolist()) == want
            np.testing.assert_allclose(
                np.sort(vals[b, t]), np.sort(logits[b, t][idx[b, t]]))

    dense = np.asarray(densify_topk(vals, idx, 16))
    # kept entries exact; dropped entries 100 below the row max -> their
    # softmax mass underflows to exactly 0 in f32
    p = jax.nn.softmax(jnp.asarray(dense), axis=-1)
    p_np = np.asarray(p)
    for b in range(2):
        for t in range(5):
            kept = idx[b, t]
            np.testing.assert_allclose(dense[b, t][kept], vals[b, t])
            dropped = [v for v in range(16) if v not in set(kept.tolist())]
            assert p_np[b, t][dropped].max() == 0.0


def test_teacher_cache_topk_lossless_when_k_covers_vocab(tmp_path):
    """K >= vocab: the truncated replay reproduces the full softmax exactly
    (tail is empty), so topk mode degrades gracefully to exact."""
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache, densify_topk
    from rtvc_tpu.distill import kl_divergence_loss

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 3, 8)).astype(np.float32)
    cache = TeacherLogitsCache(str(tmp_path), top_k=8)
    keys = [cache.key("a", 0), cache.key("b", 1)]
    cache.put_batch(keys, logits)
    vals, idx = cache.get_batch(keys)
    dense = densify_topk(vals, idx, 8)
    student = jnp.asarray(rng.normal(size=(2, 3, 8)), jnp.float32)
    kl_full = float(kl_divergence_loss(student, jnp.asarray(logits)))
    kl_topk = float(kl_divergence_loss(student, dense))
    assert abs(kl_full - kl_topk) < 1e-5, (kl_full, kl_topk)


@pytest.mark.slow
def test_train_with_topk_teacher_cache(tmp_path):
    """Two-epoch run with the top-K cache: epoch 2 hits, losses finite, and
    hit-epoch losses equal miss-epoch losses (the miss path replays through
    the same truncated representation)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    config = from_dict({
        "logger": {"save_dir": str(tmp_path)},
        "train": {"lr": 1e-3, "batch_size": 4,
                  "trainer": {"max_epochs": 2, "enable_checkpointing": False}},
        "teacher": {"vocab_size": 256},
        "wandb": {"mode": "disabled"},
    })
    tok = BertWordPieceTokenizer()

    def loader(seed):
        return [synth_batch(b=4, seed=seed)
                | {"vid-id": [f"v{i}" for i in range(4)],
                   "caption-id": list(range(4))}]

    tvars = teacher.init(jax.random.PRNGKey(1), synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])
    cache = TeacherLogitsCache(str(tmp_path / "cache"), top_k=16)
    state, history = train(config, loader(0), loader(1), loader(2), tok,
                           run_name="topk", student=student, teacher=teacher,
                           teacher_vars=tvars, max_epochs=2,
                           teacher_cache=cache, use_orbax=False)
    assert cache.stats()["hits"] == 4 and cache.stats()["misses"] == 4
    assert all(np.isfinite(l) for l in history["train_loss"])


def test_cache_replay_feed_prefetches_hits(tmp_path):
    """CacheReplayFeed: hits arrive as pre-uploaded device arrays matching
    the cache contents; misses pass through with keys only."""
    from rtvc_tpu.data.teacher_cache import CacheReplayFeed, TeacherLogitsCache

    cache = TeacherLogitsCache(str(tmp_path / "tc"), top_k=4)
    rng = np.random.default_rng(0)
    dense = rng.normal(size=(2, 3, 16)).astype(np.float32)
    keys_hit = [cache.key("v0", 0), cache.key("v1", 1)]
    cache.put_batch(keys_hit, dense)

    batches = [
        {"frames": np.zeros((2, 1)), "caption": np.zeros((2, 3), np.int32),
         "vid-id": ["v0", "v1"], "caption-id": [0, 1]},       # hit
        {"frames": np.zeros((2, 1)), "caption": np.zeros((2, 3), np.int32),
         "vid-id": ["v9", "v8"], "caption-id": [9, 8]},       # miss
    ]
    out = list(CacheReplayFeed(batches, cache))
    assert len(out) == 2
    hit, miss = out
    assert hit["_cache_keys"] == keys_hit
    want_vals, want_idx = cache.compress(dense)
    np.testing.assert_array_equal(np.asarray(hit["teacher_topk_vals"]),
                                  want_vals)
    np.testing.assert_array_equal(np.asarray(hit["teacher_topk_idx"]),
                                  want_idx)
    assert "teacher_topk_vals" not in miss
    assert miss["_cache_keys"] == [cache.key("v9", 9), cache.key("v8", 8)]


def test_cache_replay_feed_full_vocab_mode(tmp_path):
    from rtvc_tpu.data.teacher_cache import CacheReplayFeed, TeacherLogitsCache

    cache = TeacherLogitsCache(str(tmp_path / "tc"))
    dense = np.arange(2 * 3 * 5, dtype=np.float32).reshape(2, 3, 5)
    keys = [cache.key("v0", 0), cache.key("v1", 1)]
    cache.put_batch(keys, dense)
    batches = [{"frames": 0, "caption": 0,
                "vid-id": ["v0", "v1"], "caption-id": [0, 1]}]
    (hit,) = list(CacheReplayFeed(batches, cache))
    np.testing.assert_array_equal(np.asarray(hit["teacher_logits"]), dense)


def test_cache_replay_feed_requires_ids(tmp_path):
    from rtvc_tpu.data.teacher_cache import CacheReplayFeed, TeacherLogitsCache

    cache = TeacherLogitsCache(str(tmp_path / "tc"))
    with pytest.raises(ValueError, match="vid-id"):
        list(CacheReplayFeed([{"frames": 0, "caption": 0}], cache))


def test_teacher_cache_topk_change_misses_not_truncates(tmp_path):
    """Changing top_k against the same cache_dir must MISS (K is in the
    filename), never silently replay pairs truncated at the old K."""
    from rtvc_tpu.data.teacher_cache import TeacherLogitsCache

    dense = np.random.default_rng(0).normal(size=(1, 2, 8)).astype(np.float32)
    c128 = TeacherLogitsCache(str(tmp_path / "tc"), top_k=4)
    key = [c128.key("v", 0)]
    c128.put_batch(key, dense)
    assert c128.get_batch(key) is not None
    c64 = TeacherLogitsCache(str(tmp_path / "tc"), top_k=2)
    assert c64.get_batch(key) is None  # different K → miss, recompute
    cfull = TeacherLogitsCache(str(tmp_path / "tc"))
    assert cfull.get_batch(key) is None  # full-vocab mode → miss too


def test_set_learning_rate_preserves_sharding():
    """The lr update must keep the leaf's placement: a plain host scalar
    inside a mesh-placed opt_state gives the jitted step mixed input
    shardings (a measured 100x dispatch penalty on the TPU tunnel)."""
    from rtvc_tpu.train import set_learning_rate

    mesh = make_mesh((4, 2), ("dp", "tp"))
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = tx.init({"w": jnp.zeros((4, 4))})
    opt_state = replicate(opt_state, mesh)
    before = opt_state.hyperparams["learning_rate"].sharding
    out = set_learning_rate(opt_state, 5e-4)
    leaf = out.hyperparams["learning_rate"]
    assert leaf.sharding == before, (leaf.sharding, before)
    assert float(leaf) == pytest.approx(5e-4)


def test_set_learning_rate_preserves_aval():
    """The new lr leaf must carry the IDENTICAL abstract value (dtype,
    weak-type) as the one inject_hyperparams created — any aval change
    re-traces and recompiles the full train step at every epoch boundary
    (two ~100 s stalls per epoch measured on the TPU tunnel)."""
    from rtvc_tpu.train import set_learning_rate

    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    opt_state = jax.jit(tx.init)({"w": jnp.zeros((4, 4))})
    leaf = opt_state.hyperparams["learning_rate"]
    out = set_learning_rate(opt_state, 5e-4)
    new = out.hyperparams["learning_rate"]
    assert new.aval == leaf.aval, (new.aval, leaf.aval)
    assert new.sharding == leaf.sharding
    assert float(new) == pytest.approx(5e-4)


@pytest.mark.slow
def test_multi_step_dispatch_matches_singles(setup):
    """steps_per_dispatch: the lax.scan multi-step program must reproduce
    K single dispatches exactly — same per-step losses, same final params
    (the dropout rng folds with state.step, which increments inside the
    scan, so even the stochastic path lines up)."""
    student, teacher, batch, tx, state, tvars = setup
    rng = jax.random.PRNGKey(11)
    b2 = synth_batch(seed=5)
    step1 = make_train_step(student, teacher, tx, donate=False)
    stepK = make_train_step(student, teacher, tx, donate=False,
                            steps_per_dispatch=2)

    s_ref = state
    ref_losses = []
    for bt in (batch, b2):
        s_ref, m = step1(s_ref, tvars, bt, rng)
        ref_losses.append(float(m["total"]))

    stacked = {k: jnp.stack([batch[k], b2[k]]) for k in batch}
    s_multi, mk = stepK(state, tvars, stacked, rng)

    got = [float(x) for x in np.asarray(mk["total"])]
    np.testing.assert_allclose(got, ref_losses, rtol=1e-6, atol=1e-7)
    assert int(s_multi.step) == int(s_ref.step)

    # Param equality is pinned under SGD: update = lr*grad keeps the
    # scan-vs-sequential comparison at ulp scale, whereas Adam's
    # m/(sqrt(v)+eps) amplifies last-ulp gradient noise on near-zero-grad
    # params into O(lr) sign flips (observed: loss-equal runs with ~2e-5
    # param drift) — an Adam property, not a dispatch-mode difference.
    tx_sgd = optax.sgd(1e-3)
    st0 = TrainState(params=state.params, batch_stats=state.batch_stats,
                     opt_state=tx_sgd.init(state.params),
                     step=jnp.int32(0))
    student_, teacher_ = student, teacher
    s1 = make_train_step(student_, teacher_, tx_sgd, donate=False)
    sK = make_train_step(student_, teacher_, tx_sgd, donate=False,
                         steps_per_dispatch=2)
    s_ref2 = st0
    for bt in (batch, b2):
        s_ref2, _ = s1(s_ref2, tvars, bt, rng)
    s_multi2, _ = sK(st0, tvars, stacked, rng)
    for a, b in zip(jax.tree.leaves(s_multi2.params),
                    jax.tree.leaves(s_ref2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_train_loop_steps_per_dispatch(tmp_path):
    """train() with cfg.tpu.steps_per_dispatch=2 over 5 batches (two
    groups of 2 + one tail single per epoch) reproduces the
    single-dispatch loop's per-epoch losses."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    tok = BertWordPieceTokenizer()
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])

    def loader(base):
        return [synth_batch(b=4, seed=base + s)
                | {"vid-id": [f"v{s}_{i}" for i in range(4)],
                   "caption-id": list(range(4))}
                for s in range(5)]

    def run(spd):
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / f"spd{spd}")},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "trainer": {"max_epochs": 1}},
            "tpu": {"steps_per_dispatch": spd},
            "wandb": {"mode": "disabled"},
        })
        _, history = train(config, loader(0), loader(20), loader(40), tok,
                           run_name=f"spd{spd}", student=student,
                           teacher=teacher, teacher_vars=tvars, max_epochs=1)
        return history["train_loss"]

    h1 = run(1)
    h2 = run(2)
    np.testing.assert_allclose(h2, h1, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_train_loop_spd_batch_size_change(tmp_path):
    """steps_per_dispatch grouping across a MID-EPOCH batch-size change:
    sizes [8,8,4,4,8] with spd=2 must regroup at the new size (not fall
    back to singles for the rest of the epoch) and reproduce the spd=1
    losses; sizes [8,4,8,8] exercises the drain-pending-then-restart
    path where every size flip strands one single. (Sizes stay multiples
    of the default dp axis so the ragged-trim guard never fires.)"""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    tok = BertWordPieceTokenizer()
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])

    def loader(sizes, base):
        return [synth_batch(b=b, seed=base + s)
                | {"vid-id": [f"v{s}_{i}" for i in range(b)],
                   "caption-id": list(range(b))}
                for s, b in enumerate(sizes)]

    def run(spd, sizes, tag):
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / tag)},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "trainer": {"max_epochs": 1}},
            "tpu": {"steps_per_dispatch": spd},
            "wandb": {"mode": "disabled"},
        })
        _, history = train(config, loader(sizes, 0), loader(sizes, 20),
                           loader(sizes, 40), tok, run_name=tag,
                           student=student, teacher=teacher,
                           teacher_vars=tvars, max_epochs=1)
        return history["train_loss"]

    for sizes in ([8, 8, 4, 4, 8], [8, 4, 8, 8]):
        tag = "x".join(map(str, sizes))
        h1 = run(1, sizes, f"s1_{tag}")
        h2 = run(2, sizes, f"s2_{tag}")
        np.testing.assert_allclose(h2, h1, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_train_loop_spd_caption_length_change(tmp_path):
    """The group key is the FULL array signature, not just the batch
    size: two same-size batches whose captions are padded to different
    lengths must NOT be stacked into one multi-step dispatch (jnp.stack
    would raise mid-epoch); they drain singly and reproduce spd=1."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    tok = BertWordPieceTokenizer()
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])

    def loader(t_lens, base):
        return [synth_batch(b=8, t=t, seed=base + s)
                | {"vid-id": [f"v{s}_{i}" for i in range(8)],
                   "caption-id": list(range(8))}
                for s, t in enumerate(t_lens)]

    t_lens = [6, 6, 8, 8, 6]  # same batch size, caption pad flips 6->8->6

    def run(spd):
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / f"tlen{spd}")},
            "train": {"lr": 1e-3, "batch_size": 8,
                      "trainer": {"max_epochs": 1}},
            "tpu": {"steps_per_dispatch": spd},
            "wandb": {"mode": "disabled"},
        })
        _, history = train(config, loader(t_lens, 0), loader(t_lens, 20),
                           loader(t_lens, 40), tok, run_name=f"tlen{spd}",
                           student=student, teacher=teacher,
                           teacher_vars=tvars, max_epochs=1)
        return history["train_loss"]

    np.testing.assert_allclose(run(2), run(1), rtol=1e-6, atol=1e-7)


def test_train_loop_spd_tail_records_first_dispatch(tmp_path):
    """An epoch with fewer batches than steps_per_dispatch drains entirely
    through the tail path — which must still capture first_dispatch_s
    (the compile-vs-steady-state attribution field)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()
    tok = BertWordPieceTokenizer()
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])
    loader = [synth_batch(b=8, seed=s)
              | {"vid-id": [f"v{s}_{i}" for i in range(8)],
                 "caption-id": list(range(8))}
              for s in range(2)]
    config = from_dict({
        "logger": {"save_dir": str(tmp_path / "tail")},
        "train": {"lr": 1e-3, "batch_size": 8,
                  "trainer": {"max_epochs": 1}},
        "tpu": {"steps_per_dispatch": 4},  # > n_batches: tail-only epoch
        "wandb": {"mode": "disabled"},
    })
    _, history = train(config, loader, loader, loader, tok,
                       run_name="tail", student=student, teacher=teacher,
                       teacher_vars=tvars, max_epochs=1)
    assert len(history["train_loss"]) == 1
    assert history["epoch_first_dispatch_s"][0] > 0.0


# ---------------------------------------------------------------- grad accum

@pytest.mark.slow
def test_grad_accum_matches_full_batch_on_tiled_batch():
    """grad_accum=M on a batch that is one microbatch tiled M times must
    reproduce the grad_accum=1 full-batch step exactly: duplication leaves
    BN train-mode statistics and every mean-normalized loss unchanged, and
    the M identical microbatch gradients average to the full-batch
    gradient. Dropout off (accum draws independent noise per microbatch by
    design). SGD pins params at ulp scale (Adam amplifies last-ulp noise —
    see test_multi_step_dispatch_matches_singles). Running batch_stats are
    excluded: threading applies the momentum update M times (M consecutive
    small steps' semantics), which is the documented behavior, not a bug.
    """
    student = StudentCandidateV1(
        d_model=32, n_head=4, d_ffn=64, dropout=0.0, num_decoder_layers=2,
        vocab_size=173, max_pos_len=64, encoder_config=ENC,
        teacher_visual_dim=32, teacher_num_tokens=2 * 17, teacher_hidden=16)
    teacher = GITTeacher(GIT64)
    micro = synth_batch(b=2, seed=3)
    full = {k: jnp.concatenate([v] * 4, axis=0) for k, v in micro.items()}
    tx = optax.sgd(1e-3)
    state = create_train_state(student, jax.random.PRNGKey(0), full, tx)
    tvars = teacher.init(jax.random.PRNGKey(1), full["frames"][:1],
                         full["caption"][:1])
    rng = jax.random.PRNGKey(7)

    step1 = make_train_step(student, teacher, tx, donate=False)
    stepM = make_train_step(student, teacher, tx, donate=False, grad_accum=4)

    s_full, m_full = step1(state, tvars, full, rng)
    s_acc, m_acc = stepM(state, tvars, full, rng)

    np.testing.assert_allclose(float(m_acc["total"]), float(m_full["total"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(m_acc["kl"]), float(m_full["kl"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(m_acc["ce"]), float(m_full["ce"]),
                               rtol=1e-6, atol=1e-7)
    assert int(s_acc.step) == int(s_full.step) == 1
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


@pytest.mark.slow
def test_grad_accum_runs_and_learns(setup):
    """Adam + dropout + accumulation: one optimizer update per call, finite
    metrics, and a fixed batch overfits."""
    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False, grad_accum=2)
    rng = jax.random.PRNGKey(9)
    losses = []
    for _ in range(6):
        state, m = step(state, tvars, batch, rng)
        losses.append(float(m["total"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(m["grad_norm"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 6


def test_grad_accum_requires_divisible_batch(setup):
    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False, grad_accum=3)
    with pytest.raises(ValueError, match="must divide"):
        step(state, tvars, batch, jax.random.PRNGKey(0))  # b=8, M=3


@pytest.mark.slow
def test_grad_accum_composes_with_dp_mesh(setup):
    """docs/PARALLELISM.md claims accumulation composes with dp sharding:
    the dp-sharded grad_accum=2 step must match the unsharded one (the
    in-step reshape to [M, B/M] and the scan respect the batch sharding)."""
    student, teacher, batch, tx, state, tvars = setup
    step = make_train_step(student, teacher, tx, donate=False, grad_accum=2)
    rng = jax.random.PRNGKey(11)
    with jax.default_matmul_precision("highest"):
        _, m_single = step(state, tvars, batch, rng)
        mesh = make_mesh((4, 1))  # microbatch = 4 rows over dp=4
        state_r = TrainState(params=place_params(state.params, mesh),
                             batch_stats=replicate(state.batch_stats, mesh),
                             opt_state=jax.device_put(state.opt_state),
                             step=state.step)
        new_state, m_shard = step(state_r, replicate(tvars, mesh),
                                  shard_batch(batch, mesh), rng)
    assert abs(float(m_single["total"]) - float(m_shard["total"])) < 1e-3
    assert jax.tree.leaves(new_state.params)[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_grad_accum_composes_with_replay_cache(setup):
    """docs/PARALLELISM.md claims accumulation composes with the
    teacher-logit replay cache: the cached top-K leaves must split with
    the batch. Tiled-batch exactness, same scheme as
    test_grad_accum_matches_full_batch_on_tiled_batch."""
    vocab, t_len, k = 173, 6, 16
    micro = synth_batch(b=2, seed=5)
    rng = np.random.default_rng(5)
    micro["teacher_topk_vals"] = jnp.asarray(
        rng.normal(size=(2, t_len, k)).astype(np.float32))
    micro["teacher_topk_idx"] = jnp.asarray(
        rng.integers(0, vocab, size=(2, t_len, k)).astype(np.int32))
    full = {kk: jnp.concatenate([v] * 4, axis=0) for kk, v in micro.items()}

    student_nodrop = StudentCandidateV1(
        d_model=32, n_head=4, d_ffn=64, dropout=0.0, num_decoder_layers=2,
        vocab_size=173, max_pos_len=64, encoder_config=ENC,
        teacher_visual_dim=32, teacher_num_tokens=2 * 17, teacher_hidden=16)
    teacher = GITTeacher(GIT64)
    tx = optax.sgd(1e-3)
    state = create_train_state(student_nodrop, jax.random.PRNGKey(0),
                               {"frames": full["frames"],
                                "caption": full["caption"]}, tx)
    rng_j = jax.random.PRNGKey(3)
    step1 = make_train_step(student_nodrop, teacher, tx, donate=False,
                            external_teacher_logits=True, cache_top_k=k)
    stepM = make_train_step(student_nodrop, teacher, tx, donate=False,
                            external_teacher_logits=True, cache_top_k=k,
                            grad_accum=4)
    s_full, m_full = step1(state, {}, full, rng_j)
    s_acc, m_acc = stepM(state, {}, full, rng_j)
    np.testing.assert_allclose(float(m_acc["total"]), float(m_full["total"]),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# Beam-KD target cache (VERDICT r3 #1)
# ---------------------------------------------------------------------------

def test_teacher_beam_cache_roundtrip(tmp_path):
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache

    cache = TeacherBeamCache(str(tmp_path / "bc"), beam_size=2, max_steps=8)
    keys = [cache.key("vid1"), cache.key("vid2")]
    assert cache.get_batch(keys) is None  # cold miss
    rng = np.random.default_rng(0)
    preds = rng.integers(0, 173, size=(2, 8)).astype(np.int32)
    kd = rng.normal(size=(2, 7, 11)).astype(np.float32)
    cache.put_batch(keys, preds, kd)
    got = cache.get_batch(keys)
    np.testing.assert_array_equal(got["predictions"], preds)
    np.testing.assert_array_equal(got["kd"], kd)
    # partial miss → None (whole batch recomputes, one step signature)
    assert cache.get_batch([keys[0], cache.key("vid3")]) is None
    assert cache.stats()["hits"] == 2


def test_teacher_beam_cache_param_change_misses(tmp_path):
    """Beam hyperparameters are part of the entry filename: a config change
    must MISS and recompute, never replay beams searched under different
    beam_size/max_steps/length_penalty/top_k."""
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache

    d = str(tmp_path / "bc")
    base = dict(beam_size=2, max_steps=8, length_penalty=0.6)
    cache = TeacherBeamCache(d, **base)
    preds = np.zeros((1, 8), np.int32)
    kd = np.zeros((1, 7, 11), np.float32)
    cache.put_batch([cache.key("v")], preds, kd)
    assert cache.get_batch([cache.key("v")]) is not None
    for change in (dict(beam_size=4), dict(max_steps=15),
                   dict(length_penalty=0.7), dict(top_k=8)):
        other = TeacherBeamCache(d, **{**base, **change})
        assert other.get_batch([other.key("v")]) is None, change


def test_teacher_beam_cache_tokens_only_mode(tmp_path):
    """store_consensus=False (loss 5 without consensus KD) stores just the
    prediction rows — no [S, V] logits on disk."""
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache

    cache = TeacherBeamCache(str(tmp_path / "bc"), store_consensus=False)
    preds = np.arange(15, dtype=np.int32)[None]
    cache.put_batch([cache.key("v")], preds)
    got = cache.get_batch([cache.key("v")])
    np.testing.assert_array_equal(got["predictions"], preds)
    assert set(got) == {"predictions"}
    with pytest.raises(ValueError, match="kd_logits"):
        TeacherBeamCache(str(tmp_path / "bc2")).put_batch(["v"], preds)


def test_teacher_beam_cache_topk_roundtrip(tmp_path):
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache, densify_topk

    cache = TeacherBeamCache(str(tmp_path / "bc"), top_k=4)
    rng = np.random.default_rng(1)
    preds = rng.integers(0, 173, size=(1, 8)).astype(np.int32)
    kd = rng.normal(size=(1, 7, 11)).astype(np.float32)
    cache.put_batch([cache.key("v")], preds, kd)
    got = cache.get_batch([cache.key("v")])
    assert got["kd_vals"].shape == (1, 7, 4)
    # the densified replay preserves the top-k softmax mass exactly
    dense = np.asarray(densify_topk(got["kd_vals"], got["kd_idx"], 11))
    vals, idx = cache.compress(kd)
    np.testing.assert_allclose(
        np.take_along_axis(dense[0], idx[0], axis=-1), vals[0], rtol=1e-6)


def test_external_beam_step_guards():
    student, teacher = tiny_pair()
    tx = optax.adam(1e-3)
    # replaying the beam with no beam-KD loss active is a config error
    with pytest.raises(ValueError, match="external_teacher_beam"):
        make_train_step(student, teacher, tx, LossWeights(),
                        external_teacher_beam=True)
    # forced-logit cache + beam losses needs the beam cache too
    with pytest.raises(ValueError, match="beam cache"):
        make_train_step(student, teacher, tx,
                        LossWeights(kd_source="beam_consensus"),
                        external_teacher_logits=True)


def test_cache_replay_feed_beam_prefetch(tmp_path):
    from rtvc_tpu.data.teacher_cache import CacheReplayFeed, TeacherBeamCache

    cache = TeacherBeamCache(str(tmp_path / "bc"), beam_size=2, max_steps=8)
    batch = synth_batch(b=2) | {"vid-id": ["v0", "v1"],
                                "caption-id": [0, 1]}
    rng = np.random.default_rng(2)
    preds = rng.integers(0, 173, size=(2, 8)).astype(np.int32)
    kd = rng.normal(size=(2, 7, 11)).astype(np.float32)

    # miss epoch: keys present, no targets attached
    out = list(CacheReplayFeed([batch], beam_cache=cache))[0]
    assert out["_beam_cache_keys"] == ["v0", "v1"]
    assert "teacher_beam_predictions" not in out

    cache.put_batch(out["_beam_cache_keys"], preds, kd)
    hit = list(CacheReplayFeed([batch], beam_cache=cache))[0]
    np.testing.assert_array_equal(
        np.asarray(hit["teacher_beam_predictions"]), preds)
    np.testing.assert_array_equal(np.asarray(hit["teacher_kd_logits"]), kd)


@pytest.mark.slow
def test_train_with_beam_cache_matches_uncached(tmp_path):
    """Beam-target caching must not change training: two 2-epoch runs
    (beam-cached vs live beam) with BOTH beam-KD losses active
    (ce_teacher + beam-consensus KL) produce matching loss histories, and
    epoch 2 is all hits (beam targets key on the vid alone)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer()
    weights = LossWeights(ce_teacher=0.5, kd_source="beam_consensus")

    def loader(seed):
        return [synth_batch(b=4, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(4)],
            "caption-id": list(range(4))}]

    def run(cache):
        student, teacher = tiny_pair()
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / ("c" if cache else "n"))},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "trainer": {"max_epochs": 2}},
            "teacher": {"beam_size": 2, "max_steps": 8},
            "wandb": {"mode": "disabled"},
        })
        tvars = teacher.init(jax.random.PRNGKey(1),
                             synth_batch(b=1)["frames"],
                             synth_batch(b=1)["caption"])
        _, hist = train(config, loader(0), loader(1), loader(2), tok,
                        run_name="x", student=student, teacher=teacher,
                        teacher_vars=tvars, max_epochs=2,
                        loss_weights=weights, teacher_beam_cache=cache)
        return hist

    cache = TeacherBeamCache(str(tmp_path / "bcache"), beam_size=2,
                             max_steps=8)
    hist_cached = run(cache)
    hist_live = run(None)
    np.testing.assert_allclose(hist_cached["train_loss"],
                               hist_live["train_loss"], rtol=1e-5)
    # epoch 1: 4 misses; epoch 2: 4 hits
    assert cache.stats()["hits"] >= 4 and cache.stats()["misses"] >= 4
    assert hist_cached["teacher_beam_cache"]["hits"] >= 4


@pytest.mark.slow
def test_beam_replay_composes_with_dp_mesh(setup):
    """Beam-KD replay arrays (predictions + consensus logits) ride the
    SAME dp sharding as the data batch: the dp-sharded replay step's loss
    equals the unsharded step's — certifies the beam cache composes with
    the mesh the way the forced-logit cache does."""
    student, teacher, batch, tx, state, tvars = setup
    weights = LossWeights(ce_teacher=0.5, kd_source="beam_consensus")
    step = make_train_step(student, teacher, tx, weights, donate=False,
                           kd_beam_size=2, kd_max_steps=8,
                           external_teacher_beam=True)
    rng_np = np.random.default_rng(3)
    b = batch["frames"].shape[0]
    vocab = teacher.config.vocab_size
    preds = rng_np.integers(3, vocab, size=(b, 8)).astype(np.int32)
    preds[:, 6:] = 102
    kd = rng_np.normal(size=(b, 8, vocab)).astype(np.float32)
    rb = dict(batch, teacher_beam_predictions=jnp.asarray(preds),
              teacher_kd_logits=jnp.asarray(kd))
    rng = jax.random.PRNGKey(5)
    with jax.default_matmul_precision("highest"):
        _, m_single = step(state, tvars, rb, rng)
        mesh = make_mesh((-1, 1))
        state_r = TrainState(params=place_params(state.params, mesh),
                             batch_stats=replicate(state.batch_stats, mesh),
                             opt_state=jax.device_put(state.opt_state),
                             step=state.step)
        _, m_shard = step(state_r, replicate(tvars, mesh),
                          shard_batch(rb, mesh), rng)
    assert abs(float(m_single["total"]) - float(m_shard["total"])) < 1e-3


def test_beam_cache_topk_lossless_when_k_covers_vocab(tmp_path):
    """Beam-cache top-K mode degrades gracefully to exact when K >= vocab:
    the truncated replay's densified consensus rows reproduce the full
    rows' KL bitwise-close (tail empty) — the beam analogue of
    test_teacher_cache_topk_lossless_when_k_covers_vocab."""
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache, densify_topk
    from rtvc_tpu.distill import kl_divergence_loss

    rng = np.random.default_rng(2)
    kd = rng.normal(size=(2, 5, 8)).astype(np.float32)
    preds = rng.integers(0, 8, size=(2, 5)).astype(np.int32)
    cache = TeacherBeamCache(str(tmp_path), top_k=8, beam_size=2,
                             max_steps=5)
    keys = [cache.key("a"), cache.key("b")]
    cache.put_batch(keys, preds, kd)
    got = cache.get_batch(keys)
    dense = densify_topk(got["kd_vals"], got["kd_idx"], 8)
    student = jnp.asarray(rng.normal(size=(2, 5, 8)), jnp.float32)
    kl_full = float(kl_divergence_loss(student, jnp.asarray(kd)))
    kl_topk = float(kl_divergence_loss(student, dense))
    assert abs(kl_full - kl_topk) < 1e-5, (kl_full, kl_topk)
    np.testing.assert_array_equal(got["predictions"], preds)


@pytest.mark.slow
def test_train_with_topk_beam_cache(tmp_path):
    """Two-epoch loss-5 run with the top-K beam cache: epoch 2 all hits,
    losses finite, and when K covers the vocab the cached run's losses
    EQUAL the uncached run's (truncation empty -> exact replay)."""
    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.teacher_cache import TeacherBeamCache
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer()
    weights = LossWeights(ce_teacher=0.5, kd_source="beam_consensus")

    def loader(seed):
        return [synth_batch(b=4, seed=seed) | {
            "vid-id": [f"v{i}" for i in range(4)],
            "caption-id": list(range(4))}]

    def run(cache, tag):
        student, teacher = tiny_pair()
        config = from_dict({
            "logger": {"save_dir": str(tmp_path / tag)},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "trainer": {"max_epochs": 2,
                                  "enable_checkpointing": False}},
            "teacher": {"beam_size": 2, "max_steps": 8},
            "wandb": {"mode": "disabled"},
        })
        tvars = teacher.init(jax.random.PRNGKey(1),
                             synth_batch(b=1)["frames"],
                             synth_batch(b=1)["caption"])
        _, hist = train(config, loader(0), loader(1), loader(2), tok,
                        run_name=tag, student=student, teacher=teacher,
                        teacher_vars=tvars, max_epochs=2,
                        loss_weights=weights, teacher_beam_cache=cache,
                        use_orbax=False)
        return hist

    vocab = 173  # tiny_pair teacher vocab; K = vocab -> exact
    cache = TeacherBeamCache(str(tmp_path / "bc"), top_k=vocab,
                             beam_size=2, max_steps=8)
    hist_topk = run(cache, "topk")
    hist_live = run(None, "live")
    assert cache.stats()["hits"] >= 4 and cache.stats()["misses"] >= 4
    np.testing.assert_allclose(hist_topk["train_loss"],
                               hist_live["train_loss"], rtol=1e-5)


@pytest.mark.slow
def test_resume_schedule_bitwise_continuation(tmp_path):
    """A preempted 3-epoch run resumed with ``resume_schedule=True`` ends
    with BITWISE the params/opt_state of the uninterrupted run: the epoch
    loop continues at the interrupted epoch, already-trained batches are
    skipped without compute, the loader's shuffle epoch is re-aligned via
    ``set_epoch``, and the plateau scheduler state is restored from the
    checkpoint meta. (Default ``resume_from`` semantics — "train
    max_epochs more" — stay as pinned by
    test_preemption_checkpoint_and_resume; the reference had no resume.)"""
    import os as _os
    import signal as _signal

    from rtvc_tpu.config import from_dict
    from rtvc_tpu.data.io import checkpoint_meta
    from rtvc_tpu.tokenization import BertWordPieceTokenizer

    student, teacher = tiny_pair()

    def cfg():
        return from_dict({
            "logger": {"save_dir": str(tmp_path)},
            "train": {"lr": 1e-3, "batch_size": 4,
                      "plateau_patience": 0,  # anneal on any bad epoch
                      "trainer": {"max_epochs": 3}},
            "callback": {"save_top_k": 3},  # keep ckpt_01 for the resume
            "wandb": {"mode": "disabled"},
        })

    class ShuffledLoader:
        """Deterministic per-iteration-shuffled loader speaking the
        ``set_epoch`` protocol; optionally SIGTERMs before yielding batch
        ``kill[1]`` of iteration ``kill[0]`` (counting every ``__iter__``
        like DeviceLoader — train()'s example fetch is iteration 0, so
        epoch e of the loop iterates as 1+e)."""

        def __init__(self, kill=None):
            self._epoch = 0
            self.kill = kill
            self.seen_set_epoch = []

        def set_epoch(self, epoch):
            self.seen_set_epoch.append(int(epoch))
            self._epoch = int(epoch)

        def __len__(self):
            return 4

        def __iter__(self):
            e = self._epoch
            self._epoch += 1
            order = np.random.default_rng(100 + e).permutation(4)
            for j, i in enumerate(order):
                if self.kill == (e, j):
                    _os.kill(_os.getpid(), _signal.SIGTERM)
                yield synth_batch(b=4, seed=int(i)) | {
                    "vid-id": [f"v{int(i)}_{k}" for k in range(4)],
                    "caption-id": list(range(4))}

    def eval_loader(seed):
        return [synth_batch(b=4, seed=seed) | {
            "vid-id": [f"e{i}" for i in range(4)],
            "caption-id": list(range(4))}]

    tok = BertWordPieceTokenizer()
    tvars = teacher.init(jax.random.PRNGKey(1),
                         synth_batch(b=1)["frames"],
                         synth_batch(b=1)["caption"])

    # reference: 3 epochs, never interrupted
    state_a, _ = train(cfg(), ShuffledLoader(), eval_loader(1),
                       eval_loader(2), tok, run_name="sched_a",
                       student=student, teacher=teacher, teacher_vars=tvars)
    assert int(state_a.step) == 12

    # interrupted: SIGTERM before batch 2 of epoch 1 (loader iteration 2)
    prev = _signal.getsignal(_signal.SIGTERM)
    state_b, hist_b = train(cfg(), ShuffledLoader(kill=(2, 2)),
                            eval_loader(1), eval_loader(2), tok,
                            run_name="sched_b", student=student,
                            teacher=teacher, teacher_vars=tvars)
    assert hist_b["preempted"] is True
    assert int(state_b.step) == 6          # epoch 0 (4) + 2 of epoch 1
    assert _signal.getsignal(_signal.SIGTERM) is prev
    ckpt = str(tmp_path / "run" / "sched_b" / "ckpt_preempt")
    meta = checkpoint_meta(ckpt)
    assert meta["epoch"] == 1 and meta["steps_into_epoch"] == 2
    assert meta["plateau"]["lr"] == pytest.approx(1e-3)

    # completed: same TOTAL schedule, from the preemption checkpoint
    res_loader = ShuffledLoader()
    state_c, hist_c = train(cfg(), res_loader, eval_loader(1),
                            eval_loader(2), tok, run_name="sched_c",
                            student=student, teacher=teacher,
                            teacher_vars=tvars, resume_from=ckpt,
                            resume_schedule=True)
    assert res_loader.seen_set_epoch == [2]  # epoch 1 iterates as 2
    assert int(state_c.step) == 12
    assert len(hist_c["train_loss"]) == 2    # epochs 1 and 2 only
    for field in ("params", "opt_state", "batch_stats"):
        flat_a = jax.tree_util.tree_leaves(getattr(state_a, field))
        flat_c = jax.tree_util.tree_leaves(getattr(state_c, field))
        assert len(flat_a) == len(flat_c)
        for x, y in zip(flat_a, flat_c):
            assert np.array_equal(np.asarray(x), np.asarray(y)), field

    # epoch-end checkpoints also record their schedule position: resuming
    # ckpt_01 with resume_schedule runs exactly the one remaining epoch
    e_ckpt = str(tmp_path / "run" / "sched_a" / "ckpt_01")
    meta_e = checkpoint_meta(e_ckpt)
    assert meta_e["epoch"] == 1 and "plateau" in meta_e
    res2 = ShuffledLoader()
    state_d, hist_d = train(cfg(), res2, eval_loader(1), eval_loader(2),
                            tok, run_name="sched_d", student=student,
                            teacher=teacher, teacher_vars=tvars,
                            resume_from=e_ckpt, resume_schedule=True)
    assert res2.seen_set_epoch == [3]
    assert int(state_d.step) == 12
    assert len(hist_d["train_loss"]) == 1
    for x, y in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        assert np.array_equal(np.asarray(x), np.asarray(y))

    # guardrails: clear errors, not silent wrong schedules
    with pytest.raises(ValueError, match="needs resume_from"):
        train(cfg(), ShuffledLoader(), eval_loader(1), eval_loader(2), tok,
              run_name="sched_e", student=student, teacher=teacher,
              teacher_vars=tvars, resume_schedule=True)


def test_teacher_cache_corrupt_entry_is_a_miss(tmp_path):
    """A truncated/half-written/corrupt cache file is a MISS (recompute +
    atomic rewrite), never a crash: entries are read by the
    CacheReplayFeed producer thread while the train loop's miss path
    writes vid-keyed entries that can recur across nearby batches, and a
    SIGKILL mid-write must not poison every later epoch."""
    import os

    from rtvc_tpu.data.teacher_cache import (TeacherBeamCache,
                                             TeacherLogitsCache)

    cache = TeacherLogitsCache(str(tmp_path / "c"))
    keys = ["a", "b"]
    logits = np.random.default_rng(0).normal(size=(2, 4, 7)).astype(np.float32)
    cache.put_batch(keys, logits)
    # no temp residue: writes are temp+rename
    assert all(".tmp" not in f for f in os.listdir(tmp_path / "c"))
    path = cache._path("a")
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY garbage")          # truncated / corrupt
    assert cache.get_batch(keys) is None        # miss, not ValueError
    cache.put_batch(keys, logits)               # rewrite repairs it
    np.testing.assert_array_equal(cache.get_batch(keys), logits)

    bc = TeacherBeamCache(str(tmp_path / "bc"), beam_size=2, max_steps=4)
    preds = np.arange(8, dtype=np.int32).reshape(2, 4)
    kd = np.random.default_rng(1).normal(size=(2, 4, 7)).astype(np.float32)
    bc.put_batch(["v1", "v2"], preds, kd)
    with open(bc._path("v2"), "wb") as f:
        f.write(b"PK\x03\x04 half a zip")
    assert bc.get_batch(["v1", "v2"]) is None
    bc.put_batch(["v1", "v2"], preds, kd)
    out = bc.get_batch(["v1", "v2"])
    np.testing.assert_array_equal(out["predictions"], preds)
    np.testing.assert_allclose(out["kd"], kd)
