"""Pretraining loop on the synthetic dataset (hermetic)."""
import numpy as np
import pytest

from tpuslam.data import SyntheticDataset
from tpuslam.train.pretrain import Pretrainer, batches_from

H, W = 32, 64


@pytest.mark.slow
def test_pretrainer_epoch_and_checkpoint(tmp_path):
    ds = SyntheticDataset(num_frames=8, height=H, width=W, do_augmentation=True)
    trainer = Pretrainer(
        height=H, width=W, scales=(0, 1), batch_size=4,
        log_path=tmp_path, scheduler_step_size=1,
    )
    loss1 = trainer.train_epoch(ds, progress=False)
    assert np.isfinite(loss1)
    # StepLR: epoch 2 lr = 0.1 * base
    lr_before = float(trainer.state.opt_state.hyperparams["learning_rate"])
    trainer.train_epoch(ds, progress=False)
    lr_after = float(trainer.state.opt_state.hyperparams["learning_rate"])
    assert lr_after == pytest.approx(lr_before * 0.1, rel=1e-5)

    val = trainer.validate(ds, max_batches=1)
    assert np.isfinite(val)
    err = trainer.compute_depth_error(ds, max_samples=2)
    assert "abs_rel" in err and np.isfinite(err["abs_rel"])

    folder = trainer.save()
    assert (folder / "params.msgpack").exists()
    assert (folder / "opt_state.msgpack").exists()


def test_batches_from_shapes():
    ds = SyntheticDataset(num_frames=7, height=H, width=W)
    rng = np.random.default_rng(0)
    batches = list(batches_from(ds, 3, rng))
    assert len(batches) == 2  # 7 samples, drop_last
    assert batches[0].rgb.shape == (3, 3, H, W, 3)


@pytest.mark.slow
def test_pretrainer_resume(tmp_path):
    ds = SyntheticDataset(num_frames=6, height=H, width=W)
    t1 = Pretrainer(height=H, width=W, scales=(0,), batch_size=3,
                    log_path=tmp_path, scheduler_step_size=10)
    t1.train_epoch(ds, progress=False)
    t1.save()
    kernel = np.asarray(
        t1.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    ).copy()

    t2 = Pretrainer(height=H, width=W, scales=(0,), batch_size=3,
                    log_path=tmp_path, scheduler_step_size=10)
    t2.load()
    assert t2.epoch == 1  # resumes the epoch counter
    np.testing.assert_array_equal(
        np.asarray(t2.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]),
        kernel,
    )
    # optimizer restored: Adam moments are non-zero after the first epoch
    import jax
    moments = jax.tree_util.tree_leaves(t2.state.opt_state)
    assert any(np.abs(np.asarray(m)).sum() > 0 for m in moments if hasattr(m, "shape"))
    # training continues
    loss = t2.train_epoch(ds, progress=False)
    assert np.isfinite(loss) and t2.epoch == 2


@pytest.mark.slow
def test_pretrainer_depth_panel(tmp_path):
    ds = SyntheticDataset(num_frames=4, height=H, width=W)
    trainer = Pretrainer(height=H, width=W, scales=(0,), batch_size=2,
                         log_path=tmp_path)
    out = trainer.save_depth_panel(ds)
    assert out.exists() and out.suffix == ".png"


@pytest.mark.slow
def test_validate_undersized_split_warns_not_nan(tmp_path, capsys):
    """A val split smaller than one batch must still produce a finite loss
    (round-4 regression: 15 epochs of silent validation_loss=nan)."""
    ds = SyntheticDataset(num_frames=2, height=H, width=W)
    trainer = Pretrainer(height=H, width=W, scales=(0,), batch_size=4,
                         log_path=tmp_path)
    val = trainer.validate(ds)
    out = capsys.readouterr().out
    assert np.isfinite(val)
    assert "smaller than" in out


@pytest.mark.slow
def test_fit_tracks_best_checkpoint(tmp_path):
    """fit() marks the best epoch by the monitored metric so downstream
    consumers can load best-not-last (round-4 degrading-pretrain fix)."""
    from tpuslam.checkpoint.io import best_checkpoint, latest_checkpoint

    ds = SyntheticDataset(num_frames=6, height=H, width=W)
    trainer = Pretrainer(height=H, width=W, scales=(0,), batch_size=3,
                         log_path=tmp_path, scheduler_step_size=10)
    trainer.fit(ds, val_dataset=ds, num_epochs=2, validate=True)
    best = best_checkpoint(tmp_path)
    assert best is not None and (best / "params.msgpack").exists()
    assert latest_checkpoint(tmp_path) is not None
    # marker records the monitored metric
    import yaml
    meta = yaml.safe_load((tmp_path / "models" / "best.yaml").read_text())
    assert meta["monitor"] == "validation_loss"
    assert np.isfinite(meta["value"])
