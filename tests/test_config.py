"""Config tree tests (reference config.py:39-95 parity)."""

import pytest

from rtvc_tpu.config import Config, cfg, from_dict


def test_defaults_match_reference():
    assert cfg.seed == 5
    assert cfg.train.batch_size == 8
    assert cfg.train.lr == 1e-4
    assert cfg.train.trainer.max_epochs == 20
    assert cfg.student.d_model == 576
    assert cfg.student.n_head == 8
    assert cfg.student.d_ffn == 1024
    assert cfg.student.dropout == 0.3
    assert cfg.student.num_decoder_layers == 2
    assert cfg.teacher.num_image_with_embedding == 6
    assert cfg.teacher.visual_feature_size == 1024
    assert cfg.teacher.beam_size == 4
    assert cfg.teacher.max_steps == 15
    assert cfg.teacher.length_penalty == 0.6


def test_dict_style_access():
    assert cfg["SEED"] == 5
    assert cfg["TRAIN"]["BATCH_SIZE"] == 8
    assert cfg["TRAIN"]["LR"] == 1e-4
    assert cfg["MODEL"]["StudentCandidateV1"]["d_model"] == 576
    assert cfg["DATA"]["VIDEOS_PATH"] == "data/MSRVTT/videos/all"


def test_from_dict_overrides():
    c = from_dict({"TRAIN": {"BATCH_SIZE": 16, "LR": 3e-4}})
    assert c.train.batch_size == 16
    assert c.train.lr == 3e-4
    assert c.seed == 5  # untouched


def test_from_dict_rejects_unknown():
    with pytest.raises(KeyError):
        from_dict({"NOT_A_KEY": 1})


def test_frozen():
    with pytest.raises(Exception):
        cfg.seed = 6  # type: ignore[misc]


def test_replace():
    c2 = Config().replace(seed=7)
    assert c2.seed == 7
