"""CLI entry point (cli.py) — end-to-end through main(argv)."""

import numpy as np
import pytest

from parallel_gcn_tpu.cli import main
from tests.conftest import has_dataset

requires_cora = pytest.mark.skipif(
    not has_dataset("cora"), reason="cora dataset not available"
)


@requires_cora
def test_cli_trains_with_overrides(capsys):
    rc = main(["cora", "epochs=3", "early_stopping=0", "mode=eager",
               "backend=segment", "verbose=true"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PARSING cora" in out
    assert "epoch=3 " in out  # three epoch lines printed
    assert "test_loss=" in out and "test_acc=" in out
    assert "epochs_run=3" in out


@requires_cora
def test_cli_three_layer_residual(capsys):
    rc = main(["cora", "n_layers=3", "hidden_dims=16,16",
               "dropouts=0.2,0.2,0.2", "residual=true", "epochs=2",
               "early_stopping=0", "mode=eager"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "epochs_run=2" in out


def test_cli_no_args_prints_usage(capsys):
    assert main([]) == 2


def test_cli_malformed_argument_is_hard_error(capsys):
    rc = main(["cora", "epochs=2", "early_stopping=0", "mode=eager", "bogus"])
    assert rc == 2
    assert "malformed argument" in capsys.readouterr().out


@requires_cora
def test_cli_typoed_value_is_hard_error(capsys):
    """epochs=10O (letter O) must NOT silently train the default epochs."""
    rc = main(["cora", "epochs=10O", "mode=eager"])
    assert rc == 2
    assert "not a valid int" in capsys.readouterr().out


@requires_cora
def test_cli_unknown_key_is_hard_error(capsys):
    rc = main(["cora", "epocs=10", "mode=eager"])
    assert rc == 2
    assert "unknown config key" in capsys.readouterr().out


@requires_cora
def test_cli_integral_float_override_coerces_to_int(capsys):
    """epochs=2.0 is accepted as the int 2 (coerced at parse time) — it must
    not reach range()/lax.scan as a float and crash deep in training."""
    rc = main(["cora", "epochs=2.0", "early_stopping=0", "mode=eager",
               "verbose=true"])
    assert rc == 0
    assert "epoch=2" in capsys.readouterr().out


def test_tpu_config_validates_backend_and_reorder():
    """A typo'd layout knob (e.g. reorder='comunity') must raise, not silently
    run a different layout (ADVICE.md round 1)."""
    from parallel_gcn_tpu.config import TPUConfig

    with pytest.raises(ValueError, match="reorder"):
        TPUConfig(reorder="comunity")
    with pytest.raises(ValueError, match="backend"):
        TPUConfig(backend="dens")
    TPUConfig(reorder="community", backend="hybrid")  # valid values pass


def test_cli_checkpoint_and_resume(tmp_path, capsys):
    """checkpoint_dir/checkpoint_every are reachable from the CLI key=value
    surface, and resume_from restores the run."""
    import os

    from parallel_gcn_tpu.cli import main

    ck = str(tmp_path / "ck")
    rc = main(["cora", "epochs=3", "early_stopping=0", "mode=eager",
               f"checkpoint_dir={ck}", "verbose=false"])
    if rc == 2:  # dataset unavailable in this environment
        pytest.skip("cora not available")
    assert rc == 0
    final = os.path.join(ck, "ckpt_final.npz")
    assert os.path.exists(final)
    rc = main(["cora", "epochs=5", "early_stopping=0", "mode=eager",
               f"resume_from={final}", "verbose=false"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from" in out or "epochs_run=2" in out
