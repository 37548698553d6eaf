"""Streaming separator tests: chunked stateful separation must
reproduce the offline pipeline exactly when given the same statistics
(shift disabled — the offline default for streaming comparison)."""

import numpy as np
import pytest

import jax.numpy as jnp

from demucs_tpu.pipeline import ApplyOptions, Separator
from demucs_tpu.streaming import StreamingSeparator


def _identity_model(params, mix):
    return jnp.stack([mix, mix * 0.5, mix], axis=1)


def _offline(audio, seg):
    opts = ApplyOptions(segment_samples=seg, batch_size=4, shift_offset=0,
                        max_shift_secs=0.0)
    return Separator(_identity_model, {}, 3, opts)(audio)


@pytest.mark.parametrize("n", [30011, 20480, 4096])
def test_streaming_matches_offline(n):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((2, n)) * 0.3 + 0.02).astype(np.float32)
    seg = 4096
    ref = _offline(audio, seg)

    # fixed stats = the offline track stats -> exact parity
    mono = audio.mean(0)
    stats = (float(mono.mean()), float(mono.std(ddof=1)))
    stream = StreamingSeparator(_identity_model, {}, 3,
                                segment_samples=seg, stats=stats)
    chunks = []
    pos = 0
    rng2 = np.random.default_rng(2)
    while pos < n:
        step = int(rng2.integers(100, 7000))
        out = stream.push(audio[:, pos:pos + step])
        if out.shape[-1]:
            chunks.append(out)
        pos += step
    tail = stream.flush()
    if tail.shape[-1]:
        chunks.append(tail)
    got = np.concatenate(chunks, -1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_streaming_latency_bound():
    """Output becomes available once segment+stride of audio arrived."""
    stream = StreamingSeparator(_identity_model, {}, 3,
                                segment_samples=4096, stats=(0.0, 1.0))
    rng = np.random.default_rng(3)
    got = stream.push(rng.standard_normal((2, 4096)).astype(np.float32))
    # after exactly one segment: samples before the next offset (one
    # stride) are final — latency = segment behind the feed point
    assert got.shape[-1] == 3072
    got = stream.push(rng.standard_normal((2, 3072)).astype(np.float32))
    assert got.shape[-1] == 3072
    stream.flush()


def test_streaming_batches_ready_segments():
    """A push spanning several strides runs ALL its ready segments in
    one batched device call (power-of-two padded), not one call each;
    flush batches the tail segments the same way."""
    stream = StreamingSeparator(_identity_model, {}, 3,
                                segment_samples=4096, stats=(0.0, 1.0),
                                max_batch=8)
    calls = []
    inner = stream._fn
    stream._fn = lambda p, m: (calls.append(m.shape[0]) or inner(p, m))
    rng = np.random.default_rng(5)
    # 4096 + 5*3072 buffered -> 6 ready segments in one push
    stream.push(rng.standard_normal((2, 4096 + 3072 * 5))
                .astype(np.float32))
    assert calls == [8]  # ONE call, 6 segments padded to the 8 bucket
    stream.flush()
    assert calls == [8, 1]  # one tail segment, one call


def test_streaming_dtype_default_and_cast():
    """Float params are cast to the requested dtype (bf16 is the TPU
    serving default); output stays f32 on the host."""
    import jax
    import jax.numpy as jnp_

    params = {"w": np.ones(3, np.float32), "idx": np.arange(3, dtype=np.int32)}
    stream = StreamingSeparator(_identity_model, params, 3,
                                segment_samples=4096, stats=(0.0, 1.0),
                                dtype=jnp_.bfloat16)
    flat = jax.tree.leaves(stream.params)
    assert {str(x.dtype) for x in flat} == {"bfloat16", "int32"}
    out = stream.push(np.random.default_rng(6)
                      .standard_normal((2, 8192)).astype(np.float32))
    assert out.dtype == np.float32


def test_streaming_running_stats_converge():
    """Without fixed stats the streamed output still reconstructs the
    identity closely once the statistics window has filled."""
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal((2, 30000)) * 0.3).astype(np.float32)
    stream = StreamingSeparator(_identity_model, {}, 3,
                                segment_samples=4096, stats_seconds=0.05)
    outs = [stream.push(audio[:, i:i + 5000]) for i in range(0, 30000, 5000)]
    outs.append(stream.flush())
    got = np.concatenate([o for o in outs if o.shape[-1]], -1)
    assert got.shape == (3, 2, 30000)
    # identity stem: affine normalize/denormalize cancels regardless of
    # the stats actually used
    np.testing.assert_allclose(got[0], audio, atol=1e-3)
