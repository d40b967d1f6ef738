"""DepthPosePrediction facade API tests (reference L2 surface parity)."""
import numpy as np
import pytest

from tpuslam.config.schema import DatasetConfig, DepthPoseConfig
from tpuslam.data import SyntheticDataset, sample_to_batch
from tpuslam.predictor import DepthPosePrediction
from tpuslam.train import concat_batches, make_frame_batch

H, W = 32, 64


@pytest.fixture(scope="module")
def predictor():
    dc = DatasetConfig(dataset="Synthetic", height=H, width=W)
    pc = DepthPoseConfig(batch_size=2, scales=(0, 1), num_epochs=1)
    return DepthPosePrediction(dc, pc, use_online=True)


@pytest.fixture(scope="module")
def dataset():
    return SyntheticDataset(num_frames=6, height=H, width=W)


@pytest.mark.slow
def test_predict_from_image_and_images(predictor, dataset):
    s = dataset[0]
    depth = predictor.predict_from_image(s.rgb[1])
    assert depth.shape == (H, W) and (depth > 0).all()
    d0, d1, T = predictor.predict_from_images(s.rgb[1], s.rgb[2])
    assert d0.shape == (H, W) and T.shape == (4, 4)


@pytest.mark.slow
def test_adapt_with_and_without_training_data(predictor, dataset):
    online = sample_to_batch(dataset[0])
    outputs, losses = predictor.adapt(online)  # eval path
    assert np.isfinite(float(losses["loss"]))
    training = concat_batches(online, sample_to_batch(dataset[1]))
    before = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    ).copy()
    outputs, losses = predictor.adapt(online, training, steps=2)
    after = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    )
    assert not np.allclose(before, after)
    assert ("cam_T_cam", 0, 1) in outputs


@pytest.mark.slow
def test_online_pair_is_independent(predictor, dataset):
    online = sample_to_batch(dataset[2])
    training = concat_batches(online, sample_to_batch(dataset[3]))
    main_before = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    ).copy()
    predictor.adapt(online, training, steps=1, use_online=True)
    main_after = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    )
    np.testing.assert_array_equal(main_before, main_after)  # main untouched


@pytest.mark.slow
def test_save_load_roundtrip(predictor, dataset, tmp_path):
    predictor.log_path = tmp_path
    predictor.is_trained = True
    folder = predictor.save_model()
    kernel = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    ).copy()
    # perturb then restore
    import jax

    predictor.state = predictor.state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, predictor.state.params)
    )
    predictor.load_model(folder=folder)
    restored = np.asarray(
        predictor.state.params["depth_decoder"]["dispconv_0_conv"]["kernel"]
    )
    np.testing.assert_array_equal(kernel, restored)


@pytest.mark.slow
def test_metrics_apis(predictor, dataset):
    depth_err = predictor.compute_depth_error(dataset, max_samples=2, print_results=False)
    assert "abs_rel" in depth_err
    pose_err = predictor.compute_pose_error(dataset, max_samples=2, print_results=False)
    assert np.isfinite(pose_err["trans_error"])
    val = predictor.validate(dataset, max_batches=1)
    assert np.isfinite(val)


@pytest.mark.slow
def test_predict_from_images_return_loss(predictor, dataset):
    s = dataset[0]
    K = s.K
    out = predictor.predict_from_images(
        s.rgb[0], s.rgb[1], return_loss=True,
        camera_matrix=K, inv_camera_matrix=np.linalg.inv(K),
        relative_distance=s.rel_dist[0],
    )
    d0, d1, T, losses = out
    assert np.isfinite(losses["loss"]) and losses["loss"] >= 0
    assert "velocity_loss" in losses
