"""Config system semantics: yaml merge, dotted-key overrides, coercion,
freeze — the yacs behaviors the reference's merge stack relies on
(train.py:171-191)."""

import pytest

from mvlpt_tpu.config import CfgNode, get_cfg_default


def test_yaml_merge_and_tuple_coercion(tmp_path):
    cfg = get_cfg_default()
    yml = tmp_path / "t.yaml"
    yml.write_text(
        "INPUT:\n  SIZE: (96, 96)\n  INTERPOLATION: bicubic\n"
        "OPTIM:\n  LR: 2e-3\n  MAX_EPOCH: 7\n")
    cfg.merge_from_file(str(yml))
    assert cfg.INPUT.SIZE == (96, 96)
    assert cfg.OPTIM.LR == pytest.approx(0.002)
    assert cfg.OPTIM.MAX_EPOCH == 7
    # untouched defaults survive
    assert cfg.DATALOADER.TEST.BATCH_SIZE == 100


def test_opts_list_overrides_and_types():
    cfg = get_cfg_default()
    cfg.merge_from_list([
        "TRAINER.MVLPT.COOP.N_CTX", "4",
        "TRAINER.MVLPT.VPT.DEEP", "False",
        "DATASET.SUBSAMPLE_CLASSES", "base",
        "OPTIM.LR", "0.05",
        "INPUT.SIZE", "(64, 64)",
    ])
    assert cfg.TRAINER.MVLPT.COOP.N_CTX == 4
    assert cfg.TRAINER.MVLPT.VPT.DEEP is False
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "base"
    assert cfg.OPTIM.LR == pytest.approx(0.05)
    assert cfg.INPUT.SIZE == (64, 64)


def test_unknown_key_rejected():
    cfg = get_cfg_default()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_freeze_blocks_attribute_writes():
    cfg = get_cfg_default()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 3
    cfg.defrost()
    cfg.SEED = 3
    assert cfg.SEED == 3


def test_clone_is_deep():
    cfg = get_cfg_default()
    c2 = cfg.clone()
    c2.OPTIM.LR = 123.0
    assert cfg.OPTIM.LR != 123.0


def test_dump_roundtrip():
    import yaml

    cfg = get_cfg_default()
    loaded = yaml.safe_load(cfg.dump())
    assert loaded["TRAINER"]["MVLPT"]["PROJECT_DIM"] == 128
