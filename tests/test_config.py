"""Config-surface tests: condition.txt / preset.txt parsing parity."""

import os
import textwrap

import pytest

from simulgen_vae_tpu.config import (
    LCConfig,
    VAEConfig,
    parse_condition_file,
    parse_training_parameters,
    read_preset,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_repo_condition_file():
    params = parse_condition_file(os.path.join(REPO, "input_data/condition.txt"))
    assert params["Dim1"] == "16"
    assert params["Dim3"] == "2048"
    assert params["input_type"] == "image"
    # comment stripping
    assert params["Latent_dim"] == "8"
    # '%' and "'" lines skipped -> no such keys
    assert "%LatentConditioner" not in params


def test_parse_comment_and_marker_rules(tmp_path):
    p = tmp_path / "cond.txt"
    p.write_text(textwrap.dedent("""\
        header line ignored-as key 'header' value 'line'? no: first two tokens
        % section
        ' marker
        key1 10 # trailing comment
        # full comment line
        key2	20	30
        lonely
    """))
    params = parse_condition_file(str(p))
    assert params["key1"] == "10"
    assert params["key2"] == "20"          # only first two tokens used
    assert "lonely" not in params          # single-token lines dropped
    assert "#" not in "".join(params)


def test_parse_training_parameters_types():
    params = parse_condition_file(os.path.join(REPO, "input_data/condition.txt"))
    cfg = parse_training_parameters(params)
    assert cfg["num_param"] == 16 and isinstance(cfg["num_param"], int)
    assert cfg["LR"] == 0.001 and isinstance(cfg["LR"], float)
    assert cfg["alpha"] == 1000000
    assert cfg["latent_conditioner_weight_decay"] == 1e-5
    assert cfg["use_e2e_training"] == 1
    assert cfg["e2e_loss_function"] == "Huber"
    assert cfg["LC_alpha"] == 1000.0
    assert cfg["latent_reg_weight"] == 0.001


def test_parse_training_parameters_defaults():
    """Optional keys fall back to the reference defaults (utils.py:324-349)."""
    base = parse_condition_file(os.path.join(REPO, "input_data/condition.txt"))
    for k in ("use_e2e_training", "latent_conditioner_weight_decay",
              "use_spatial_attention", "LC_alpha"):
        base.pop(k, None)
    cfg = parse_training_parameters(base)
    assert cfg["use_e2e_training"] == 0
    assert cfg["latent_conditioner_weight_decay"] == 1e-4
    assert cfg["use_spatial_attention"] == 1
    assert cfg["LC_alpha"] == 1.0


def test_read_preset():
    data_no, beta_div, enc, lc = read_preset(os.path.join(REPO, "preset.txt"))
    assert data_no == 1
    assert beta_div == 0
    assert enc == [1024, 512, 256, 128]
    assert lc == [32, 64, 128, 256, 512, 1024]


def test_vae_config_from_condition():
    params = parse_condition_file(os.path.join(REPO, "input_data/condition.txt"))
    raw = parse_training_parameters(params)
    cfg = VAEConfig.from_condition(raw, [64, 32, 16, 8])
    assert cfg.num_node == 2048
    assert cfg.loss_type == "MSE"
    assert cfg.num_filter_dec == [8, 16, 32, 64]
    assert cfg.num_hier == 3
    lc = LCConfig.from_condition(raw, [32, 64])
    assert lc.use_e2e_training is True
    assert lc.e2e_loss_function == "Huber"


def test_load_all_zero_maps_to_streaming():
    """--load_all=0 must select the streaming path (reference
    modules/utils.py:44-66 CPU-pinned semantics), not be ignored."""
    from simulgen_vae_tpu.cli import build_parser, resolve_load_all

    args = build_parser().parse_args(["--load_all=0"])
    resolve_load_all(args)
    assert args.stream is True

    args = build_parser().parse_args(["--load_all=1"])
    resolve_load_all(args)
    assert args.stream is False

    args = build_parser().parse_args(["--load_all=1", "--stream"])
    resolve_load_all(args)
    assert args.stream is True
