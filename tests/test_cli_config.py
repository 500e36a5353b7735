"""CLI config layering: args.txt merge + config->args round-trip
(brush-process/src/args_file.rs semantics)."""

from brush_tpu.cli import (
    args_from_configs, build_parser, configs_from_args, merge_args_file)


def test_args_txt_merges_under_cli(tmp_path):
    (tmp_path / "args.txt").write_text(
        "--total-train-iters 123 --sh-degree 1\n")
    argv = merge_args_file([str(tmp_path), "--sh-degree", "2"])
    a = build_parser().parse_args(argv)
    assert a.total_train_iters == 123      # from args.txt
    assert a.sh_degree == 2                # CLI wins


def test_config_args_roundtrip():
    a = build_parser().parse_args(
        ["scene", "--total-train-iters", "777", "--ssim-weight", "0.35",
         "--alpha-mode", "masked", "--max-resolution", "640",
         "--export-path", "x_{iter}.ply", "--no-pallas",
         "--background-color", "0.1,0.2,0.3"])
    tcfg, lcfg, pcfg = configs_from_args(a)
    argv = ["scene"] + args_from_configs(tcfg, lcfg, pcfg)
    a2 = build_parser().parse_args(argv)
    t2, l2, p2 = configs_from_args(a2)
    assert t2 == tcfg
    assert l2 == lcfg
    assert p2 == pcfg


def test_defaults_serialize_empty():
    a = build_parser().parse_args(["scene"])
    assert args_from_configs(*configs_from_args(a)) == []
