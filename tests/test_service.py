"""DeviceFeeder unit tests with a host-side fake separator — the
batching/routing logic itself, independent of the HTTP layer
(tests/test_serve.py covers the live-socket path)."""

import threading
import time

import numpy as np
import pytest

from demucs_tpu.pipeline import ApplyOptions, Separator
from demucs_tpu.service import DeviceFeeder


def _make_sep(batch_size=4, fail_on=None):
    """Separator over a deterministic toy model: stems = x * (i+1)."""
    calls = {"n": 0, "batches": []}

    def model(params, mix):
        import jax.numpy as jnp

        calls["n"] += 1
        if fail_on is not None and calls["n"] == fail_on:
            raise ValueError("injected device failure")
        calls["batches"].append(int(mix.shape[0]))
        return jnp.stack([mix * (i + 1) for i in range(2)], axis=1)

    sep = Separator(model, {}, 2,
                    ApplyOptions(segment_samples=256, batch_size=batch_size,
                                 shift_offset=0, max_shift_secs=0.0),
                    jit=False)
    return sep, calls


def test_feeder_routes_outputs_per_item():
    sep, calls = _make_sep(batch_size=4)
    feeder = DeviceFeeder(sep, fill_wait_s=0.05)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 2, 256)).astype(np.float32)
    b = rng.standard_normal((2, 2, 256)).astype(np.float32)
    fa = feeder.submit_segments(a)
    fb = feeder.submit_segments(b)
    out_a, out_b = fa.result(30), fb.result(30)
    np.testing.assert_allclose(out_a[:, 0], a, atol=1e-6)
    np.testing.assert_allclose(out_a[:, 1], 2 * a, atol=1e-6)
    np.testing.assert_allclose(out_b[:, 0], b, atol=1e-6)
    # 5 segments at batch 4: the two items shared a batch
    assert feeder.stats["segments"] == 5
    assert feeder.stats["device_calls"] == 2
    assert all(s == 4 for s in calls["batches"])  # padded to B
    feeder.close()


def test_feeder_item_spanning_multiple_batches():
    sep, calls = _make_sep(batch_size=2)
    feeder = DeviceFeeder(sep, fill_wait_s=0.0)
    x = np.random.default_rng(1).standard_normal((7, 2, 256)) \
        .astype(np.float32)
    out = feeder.submit_segments(x).result(30)
    assert out.shape == (7, 2, 2, 256)
    np.testing.assert_allclose(out[:, 1], 2 * x, atol=1e-6)
    assert feeder.stats["device_calls"] == 4  # ceil(7/2)
    feeder.close()


def test_feeder_exclusive_fifo_with_segments():
    sep, calls = _make_sep(batch_size=2)
    feeder = DeviceFeeder(sep, fill_wait_s=0.0)
    order = []
    x = np.ones((2, 2, 256), np.float32)
    f1 = feeder.submit_segments(x)
    f2 = feeder.run_exclusive(lambda: order.append("exclusive") or 42)
    f3 = feeder.submit_segments(x)
    assert f2.result(30) == 42
    f1.result(30)
    f3.result(30)
    assert order == ["exclusive"]
    assert feeder.stats["exclusive_calls"] == 1
    feeder.close()


def test_feeder_propagates_device_errors_and_recovers():
    sep, calls = _make_sep(batch_size=2, fail_on=1)
    feeder = DeviceFeeder(sep, fill_wait_s=0.0)
    x = np.ones((2, 2, 256), np.float32)
    with pytest.raises(ValueError, match="injected device failure"):
        feeder.submit_segments(x).result(30)
    # the feeder thread survives and serves the next request
    out = feeder.submit_segments(x).result(30)
    assert out.shape == (2, 2, 2, 256)
    feeder.close()


def test_feeder_separate_matches_direct_separator():
    sep, calls = _make_sep(batch_size=4)
    feeder = DeviceFeeder(sep, fill_wait_s=0.0)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((2, 1000)) * 0.3).astype(np.float32)
    ref = sep(audio)
    got = feeder.separate(audio)
    np.testing.assert_allclose(got, ref, atol=1e-6)
    feeder.close()


def test_feeder_concurrent_submitters_share_batches():
    sep, calls = _make_sep(batch_size=8)
    feeder = DeviceFeeder(sep, fill_wait_s=0.2)  # wide merge window
    rng = np.random.default_rng(3)
    tracks = [rng.standard_normal((2, 2, 256)).astype(np.float32)
              for _ in range(4)]
    outs = [None] * 4

    def worker(i):
        time.sleep(0.01 * i)
        outs[i] = feeder.submit_segments(tracks[i]).result(30)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for tr, out in zip(tracks, outs):
        np.testing.assert_allclose(out[:, 1], 2 * tr, atol=1e-6)
    # 8 segments from 4 submitters fit ONE batch-8 call
    assert feeder.stats["device_calls"] == 1
    feeder.close()


def test_feeder_closed_rejects():
    sep, _ = _make_sep()
    feeder = DeviceFeeder(sep)
    feeder.close()
    with pytest.raises(RuntimeError):
        feeder.submit_segments(np.zeros((1, 2, 256), np.float32))
    with pytest.raises(RuntimeError):
        feeder.run_exclusive(lambda: None)
