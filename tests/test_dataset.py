"""Out-of-core data layer (``utils/dataset.py`` + native accumulate).

Round-trip the binary format, minibatch coverage/shuffling through the
native gather + prefetch thread, and streamed SKI statistics equal to
the in-memory device scatter.
"""

import numpy as np
import pytest

from pygpr_tpu.models import ski
from pygpr_tpu.utils.dataset import BinaryDataset


def _make(tmp_path, rng, n=5000, d=2):
    x = rng.uniform(0.0, 3.0, size=(n, d)).astype(np.float32)
    y = (np.sin(x.sum(-1)) + 0.1 * rng.normal(size=n)).astype(np.float32)
    ds = BinaryDataset.write(str(tmp_path / "data.bin"), x, y)
    return ds, x, y


def test_roundtrip_and_views(tmp_path, rng):
    ds, x, y = _make(tmp_path, rng)
    assert ds.n == x.shape[0] and ds.dim == 2
    np.testing.assert_array_equal(np.asarray(ds.x), x)
    np.testing.assert_array_equal(np.asarray(ds.y), y)
    # size validation (dim=6 ⇒ 28-byte rows, not a divisor of the file)
    with pytest.raises(ValueError):
        BinaryDataset(str(tmp_path / "data.bin"), dim=6)


def test_iter_chunks_cover_everything(tmp_path, rng):
    ds, x, y = _make(tmp_path, rng, n=1037)
    xs, ys = zip(*ds.iter_chunks(chunk=100))
    np.testing.assert_array_equal(np.concatenate(xs), x)
    np.testing.assert_array_equal(np.concatenate(ys), y)


def test_minibatches_cover_epoch_exactly_once(tmp_path, rng):
    ds, x, y = _make(tmp_path, rng, n=1024, d=1)
    seen = []
    for xb, yb in ds.minibatches(128, seed=3):
        assert xb.shape == (128, 1) and yb.shape == (128,)
        seen.append(yb)
    seen = np.concatenate(seen)
    assert seen.shape[0] == 1024
    # every target seen exactly once (shuffled, no dup/loss)
    np.testing.assert_array_equal(np.sort(seen), np.sort(y))
    assert not np.array_equal(seen, y)  # actually shuffled


def test_minibatches_multi_epoch_and_drop_last(tmp_path, rng):
    ds, _, _ = _make(tmp_path, rng, n=1000, d=1)
    batches = list(ds.minibatches(300, seed=0, epochs=2))
    assert len(batches) == 6  # 3 full batches per epoch, last dropped


def test_native_gather_matches_numpy(tmp_path, rng):
    from pygpr_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    ds, x, y = _make(tmp_path, rng, n=500)
    idx = rng.integers(0, 500, size=64)
    out = np.empty((64, 3), np.float32)
    assert native.gather_rows_f32(ds._mm, idx, out)
    np.testing.assert_array_equal(out[:, :2], x[idx])
    np.testing.assert_array_equal(out[:, 2], y[idx])


@pytest.mark.parametrize("d", [1, 2])
def test_streamed_stats_match_device_scatter(tmp_path, rng, d):
    """Native f64 streaming accumulate == in-memory compute_stats."""
    n = 3000
    x = rng.uniform(0.0, 2.0, size=(n, d))
    y = np.sin(x.sum(-1)) + 0.1 * rng.normal(size=n)
    grid = ski.make_grid(x, 24)
    ref = ski.compute_stats(x, jnp_y := np.asarray(y), grid)
    ds = BinaryDataset.write(
        str(tmp_path / f"s{d}.bin"), x.astype(np.float32),
        y.astype(np.float32),
    )
    got = ski.compute_stats_streamed(ds, grid, chunk=700)
    assert got.n == ref.n == n
    # storage is f32, so compare at f32 accuracy
    np.testing.assert_allclose(np.asarray(got.z), np.asarray(ref.z),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.wty),
                               np.asarray(ref.wty), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got.yty), float(ref.yty),
                               rtol=1e-5)


def test_streamed_stats_arrays_source_and_fit(rng):
    """(x, y) array source; fit_direct on streamed stats converges to
    the in-memory-stats fit."""
    import jax.numpy as jnp

    from pygpr_tpu.ops.kernels import RBF

    n = 4000
    x = np.sort(rng.uniform(0.0, 4.0, size=(n, 1)), axis=0)
    y = np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=n)
    grid = ski.make_grid(x, 96)
    st = ski.compute_stats_streamed((x, y), grid, chunk=1000)
    res = ski.fit_direct(RBF(), jnp.ones(3), x, jnp.asarray(y), grid,
                         stats=st)
    res_ref = ski.fit_direct(RBF(), jnp.ones(3), x, jnp.asarray(y),
                             grid)
    np.testing.assert_allclose(np.asarray(res.params),
                               np.asarray(res_ref.params), rtol=1e-3)


def test_svgp_fit_streamed_classification(tmp_path, rng):
    """Out-of-core SVGP: minibatches stream from the memory-mapped
    file through the native loader; the classifier actually learns."""
    import jax.numpy as jnp

    from pygpr_tpu.models import obs, svgp
    from pygpr_tpu.ops.kernels import RBF

    n = 4096
    x = rng.uniform(-2.0, 2.0, size=(n, 2)).astype(np.float32)
    y = (x[:, 0] * x[:, 1] > 0).astype(np.float32)
    ds = BinaryDataset.write(str(tmp_path / "cls.bin"), x, y)
    z0 = x[rng.choice(n, 24, replace=False)]
    fit = svgp.fit_streamed(
        RBF(), obs.BernoulliLogit(), ds, jnp.asarray(z0),
        batch_size=512, epochs=6, learning_rate=0.1, seed=0,
    )
    losses = np.asarray(fit.losses)
    assert np.isfinite(losses).all()
    assert losses[-8:].mean() < losses[:8].mean() * 0.7

    xs = rng.uniform(-1.8, 1.8, size=(400, 2)).astype(np.float32)
    p, _ = svgp.predict(RBF(), obs.BernoulliLogit(), fit.params,
                        jnp.asarray(xs))
    acc = float(np.mean(
        (np.asarray(p) > 0.5) == (xs[:, 0] * xs[:, 1] > 0)))
    assert acc > 0.9, acc
