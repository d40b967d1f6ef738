"""Replay buffer + cosine index + loop closure property tests (SURVEY §4e)."""
import numpy as np
import pytest

from tpuslam.data import SyntheticDataset
from tpuslam.loopclosure import LoopClosureDetection
from tpuslam.memory import CosineIndex, ReplayBuffer, normalize_l2


def _unit(rng, n, d=8):
    return normalize_l2(rng.normal(size=(n, d)).astype(np.float32))


# ---------------------------------------------------------------- CosineIndex
def test_index_add_search_remove(rng):
    idx = CosineIndex(8)
    vecs = _unit(rng, 5)
    idx.add_with_ids(vecs, [10, 11, 12, 13, 14])
    sims, ids = idx.search(vecs[2][None], 3)
    assert ids[0, 0] == 12 and sims[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert idx.remove_ids([12]) == 1
    sims, ids = idx.search(vecs[2][None], 5)
    assert 12 not in ids[0]
    assert ids[0, -1] == -1  # padded beyond ntotal


def test_index_reconstruct_and_state(rng):
    idx = CosineIndex(8)
    vecs = _unit(rng, 3)
    idx.add_with_ids(vecs, [7, 8, 9])
    np.testing.assert_allclose(idx.reconstruct(8), vecs[1])
    idx2 = CosineIndex.from_state_dict(idx.state_dict())
    assert idx2.ntotal == 3
    np.testing.assert_allclose(idx2.reconstruct(9), vecs[2])


def test_index_duplicate_id_rejected(rng):
    idx = CosineIndex(4)
    idx.add_with_ids(_unit(rng, 1, 4), [1])
    with pytest.raises(ValueError):
        idx.add_with_ids(_unit(rng, 1, 4), [1])


# --------------------------------------------------------------- ReplayBuffer
def _samples(n, ds=None):
    ds = ds or SyntheticDataset(num_frames=n, height=24, width=48)
    return [ds[i] for i in range(n)]


def test_buffer_similarity_gate(rng):
    buf = ReplayBuffer(max_buffer_size=10, similarity_threshold=0.95,
                       do_augmentation=False)
    samples = _samples(3)
    e0 = _unit(rng, 1)[0]
    assert buf.add(samples[0], e0) is None and len(buf) == 1
    # near-duplicate embedding -> rejected
    near = normalize_l2(e0 + rng.normal(size=8).astype(np.float32) * 0.01)
    buf.add(samples[1], near)
    assert len(buf) == 1
    # orthogonal embedding -> admitted
    far = _unit(rng, 1)[0]
    buf.add(samples[2], far)
    assert len(buf) == 2


def test_buffer_diversity_eviction(rng):
    """Eviction must remove the most redundant sample (max total similarity)."""
    buf = ReplayBuffer(max_buffer_size=3, similarity_threshold=0.999,
                       do_augmentation=False)
    samples = _samples(4)
    base = np.eye(8, dtype=np.float32)
    # two nearly-identical vectors (0, 1) and two orthogonal ones
    e = [base[0], normalize_l2(base[0] + 0.05 * base[3]), base[1], base[2]]
    for s, emb in zip(samples[:3], e[:3]):
        buf.add(s, emb)
    assert len(buf) == 3
    evicted = buf.add(samples[3], e[3])
    assert len(buf) == 3
    # one of the near-duplicates (ids 0 or 1) must have been evicted
    assert evicted in (0, 1)


def test_buffer_capacity_invariant(rng):
    buf = ReplayBuffer(max_buffer_size=5, similarity_threshold=2.0,  # admit all
                       do_augmentation=False)
    for s in _samples(12):
        buf.add(s, rng.normal(size=16).astype(np.float32))
        assert len(buf) <= 5


def test_buffer_get_excludes_current_and_is_seeded():
    ds = SyntheticDataset(num_frames=6, height=24, width=48)
    rng = np.random.default_rng(0)
    buf = ReplayBuffer(max_buffer_size=10, similarity_threshold=2.0,
                       batch_size=2, do_augmentation=False, seed=42)
    for i in range(5):
        buf.add(ds[i], rng.normal(size=8).astype(np.float32))
    draws = buf.get(current_index=4)
    assert len(draws) == 2
    assert all(d.index != 4 for d in draws)
    # deterministic: same-seeded buffer reproduces the draw sequence
    buf2 = ReplayBuffer(max_buffer_size=10, similarity_threshold=2.0,
                        batch_size=2, do_augmentation=False, seed=42)
    rng2 = np.random.default_rng(0)
    for i in range(5):
        buf2.add(ds[i], rng2.normal(size=8).astype(np.float32))
    draws2 = buf2.get(current_index=4)
    assert [d.index for d in draws] == [d.index for d in draws2]


def test_buffer_save_load_offset(tmp_path, rng):
    buf = ReplayBuffer(storage_dir=tmp_path, max_buffer_size=10,
                       similarity_threshold=2.0, do_augmentation=False)
    for s in _samples(3):
        buf.add(s, rng.normal(size=8).astype(np.float32))
    state = buf.save_state()

    buf2 = ReplayBuffer(storage_dir=tmp_path, state_path=state,
                        max_buffer_size=10, similarity_threshold=2.0,
                        do_augmentation=False)
    assert len(buf2) == 3
    assert buf2.index_offset == 3  # ids continue past the loaded max
    buf2.add(_samples(1)[0], rng.normal(size=8).astype(np.float32))
    assert len(buf2) == 4
    assert 3 in buf2.index.ids  # new id = 0 + offset 3


def test_buffer_augmentation_changes_images():
    ds = SyntheticDataset(num_frames=3, height=24, width=48)
    rng = np.random.default_rng(1)
    buf = ReplayBuffer(max_buffer_size=5, similarity_threshold=2.0,
                       batch_size=1, do_augmentation=True)
    buf.add(ds[0], rng.normal(size=8).astype(np.float32))
    draw = buf.get()[0]
    assert draw.rgb_aug is not None
    assert not np.allclose(draw.rgb_aug, draw.rgb)


# ------------------------------------------------------------- Loop closures
def test_loop_closure_search_semantics(rng):
    lc = LoopClosureDetection(detection_threshold=0.9, id_threshold=5,
                              num_matches=2, num_features=8)
    base = _unit(rng, 1)[0]
    # frames 0..19: first ten share an embedding (a revisited place),
    # last ten are random
    for i in range(10):
        lc.add(i, base + rng.normal(size=8).astype(np.float32) * 0.001)
    for i in range(10, 20):
        lc.add(i, _unit(rng, 1)[0])
    matches, sims = lc.search(9)
    # frames 0..3 are > id_threshold=5 away from 9 and nearly identical
    assert matches and all(m <= 3 for m in matches)
    assert all(s > 0.9 for s in sims)
    # neighbours within id_threshold are never returned
    assert all(abs(m - 9) > 5 for m in matches)


def test_loop_closure_no_match_below_threshold(rng):
    lc = LoopClosureDetection(detection_threshold=0.99, id_threshold=1,
                              num_features=8)
    for i in range(6):
        lc.add(i, _unit(rng, 1)[0])
    matches, sims = lc.search(5)
    assert matches == [] and sims == []


def test_loop_closure_predict(rng):
    a = _unit(rng, 1)[0]
    assert LoopClosureDetection.predict(a, a) == pytest.approx(1.0, abs=1e-5)
    assert abs(LoopClosureDetection.predict(a, _unit(rng, 1)[0])) < 0.9
