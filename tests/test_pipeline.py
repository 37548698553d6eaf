"""Pipeline bookkeeping tests: shift/split/overlap-add must be lossless.

With an identity model (each "source" = the input segment), the full
normalize -> shift -> split -> batch -> overlap-add -> denormalize chain
must reconstruct the input bit-nearly — this pins every index
convention of reference src/model_apply.cpp.
"""

import numpy as np

import jax.numpy as jnp

from demucs_tpu.pipeline import (
    ApplyOptions,
    Separator,
    overlap_add,
    split_into_segments,
    triangle_weight,
)


def _identity_model(params, mix):
    # (B, C, L) -> (B, S=3, C, L)
    return jnp.stack([mix, mix * 2.0, mix], axis=1)


def test_triangle_weight_matches_reference_shape():
    w = triangle_weight(10)
    assert w.shape == (10,)
    assert w.max() == 1.0
    np.testing.assert_allclose(w[:5], np.array([1, 2, 3, 4, 5]) / 5.0)
    np.testing.assert_allclose(w[5:], w[:5][::-1])


def test_split_overlap_add_roundtrip():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 20000)).astype(np.float32)
    segment, stride = 4096, 3072
    batch, meta = split_into_segments(audio, segment, stride)
    # identity "separation" with one source
    chunks = batch[:, None, :, :]
    out = overlap_add(chunks, meta, 20000, segment, triangle_weight(segment))
    np.testing.assert_allclose(out[0], audio, atol=1e-5)


def test_separator_identity_roundtrip():
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((2, 30011)) * 0.3 + 0.05).astype(np.float32)
    opts = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=777,
                        max_shift_secs=0.02)
    sep = Separator(_identity_model, params={}, num_sources=3, options=opts)
    out = sep(audio)
    assert out.shape == (3, 2, 30011)
    np.testing.assert_allclose(out[0], audio, atol=1e-4)
    np.testing.assert_allclose(out[2], audio, atol=1e-4)
    # source 1 was scaled 2x *after* normalization; denorm is affine, so
    # out[1] = 2*(audio - mean)/std * std + mean = 2*audio - mean
    ref = audio.mean(0)
    expected = 2 * audio - ref.mean()
    np.testing.assert_allclose(out[1], expected, atol=1e-4)


def test_separator_zero_shift():
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((2, 8192)).astype(np.float32)
    opts = ApplyOptions(segment_samples=4096, batch_size=2, shift_offset=0)
    sep = Separator(_identity_model, params={}, num_sources=3, options=opts)
    out = sep(audio)
    np.testing.assert_allclose(out[0], audio, atol=1e-4)


def test_separate_many_matches_single():
    """Continuous multi-track batching == per-track results."""
    rng = np.random.default_rng(3)
    tracks = [
        (rng.standard_normal((2, 15000)) * 0.3).astype(np.float32),
        (rng.standard_normal((2, 8011)) * 0.2).astype(np.float32),
        (rng.standard_normal((2, 22222)) * 0.4).astype(np.float32),
    ]
    opts = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=100,
                        max_shift_secs=0.02)
    sep = Separator(_identity_model, params={}, num_sources=3, options=opts)
    singles = [sep(t) for t in tracks]
    many = sep.separate_many(tracks)
    assert len(many) == 3
    for s, m, t in zip(singles, many, tracks):
        assert m.shape == (3,) + t.shape
        np.testing.assert_allclose(m, s, atol=1e-5)


def test_stage_timer_report():
    from demucs_tpu.utils.profiling import StageTimer
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((2, 9000)).astype(np.float32)
    opts = ApplyOptions(segment_samples=4096, batch_size=2, shift_offset=0)
    sep = Separator(_identity_model, params={}, num_sources=3, options=opts)
    timer = StageTimer()
    sep(audio, progress=timer)
    report = timer.report()
    assert "segments" in report and "stage_s" in report


def test_fine_progress_reports_intra_segment_stages():
    """fine_progress=True embeds the reference's intra-segment stage
    markers (26 per v4 segment, reference src/model_inference.cpp:156-346)
    and routes them through the ProgressCallback."""
    from demucs_tpu import params as P
    from demucs_tpu.config import HTDemucsConfig
    from demucs_tpu.models import htdemucs_segment

    cfg = HTDemucsConfig()
    params = P.unflatten_tree(P.init_flat(P.htdemucs_schema(cfg), seed=0))
    opts = ApplyOptions(segment_samples=1024 * 16, batch_size=2,
                        shift_offset=0, fine_progress=True)
    sep = Separator(lambda p, m: htdemucs_segment(p, m, cfg), params,
                    num_sources=cfg.num_sources, options=opts)
    events = []
    audio = np.random.default_rng(5).standard_normal((2, 20000)).astype(
        np.float32) * 0.1
    sep(audio, progress=lambda f, m: events.append((f, m)))
    msgs = [m for _, m in events]
    assert "spec + normalize" in msgs
    assert "transformer layer 4" in msgs
    assert "tdecoder 3" in msgs
    assert sum(m.startswith("segments") for m in msgs) >= 1
    # fractions are monotone within a batch and bounded by 1
    fracs = [f for f, _ in events]
    assert all(0 <= f <= 1 for f in fracs)
    # 26 stages per device call, plus the per-batch reports
    stage_msgs = [m for m in msgs
                  if not m.startswith(("segments", "apply model"))]
    assert len(stage_msgs) % 26 == 0 and stage_msgs


def test_sequential_bag_matches_vmapped_bag():
    """SequentialBagSeparator (the single-device ft default, 147.2 vs
    129.5 audio-s/s on chip) must equal the vmapped one-program bag."""
    import jax
    from demucs_tpu.pipeline import SequentialBagSeparator

    def model(params, mix):
        # params is a scalar weight per model; S=4 "stems"
        return jnp.stack([mix * params["w"] * (i + 1) for i in range(4)],
                         axis=1)

    trees = [{"w": jnp.asarray(float(m + 1))} for m in range(4)]
    rng = np.random.default_rng(5)
    audio = rng.standard_normal((2, 20000)).astype(np.float32) * 0.3
    opts = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=0)

    seq = SequentialBagSeparator(model, trees, 4, opts)
    out_seq = seq(audio)

    import jax.numpy as _jnp

    stacked = jax.tree.map(lambda *xs: _jnp.stack(xs), *trees)

    def bag_fn(p, m):
        per_model = jax.vmap(lambda pi: model(pi, m))(p)  # (M, B, S, C, L)
        return _jnp.stack([per_model[i, :, i] for i in range(4)], axis=1)

    ref = Separator(bag_fn, stacked, 4, opts)(audio)
    assert out_seq.shape == ref.shape
    np.testing.assert_allclose(out_seq, ref, atol=1e-5)


def test_sequential_bag_concurrent_dispatch_reentrant():
    """_dispatch_device must not mutate instance state: concurrent
    dispatches from server threads have to see consistent per-model
    params (the r4 implementation reassigned self.params per model)."""
    import threading

    from demucs_tpu.pipeline import SequentialBagSeparator

    def model(params, mix):
        return jnp.stack([mix * params["w"] * (i + 1) for i in range(4)],
                         axis=1)

    trees = [{"w": jnp.asarray(float(m + 1))} for m in range(4)]
    opts = ApplyOptions(segment_samples=4096, batch_size=2, shift_offset=0)
    sep = SequentialBagSeparator(model, trees, 4, opts)

    rng = np.random.default_rng(7)
    chunks = [jnp.asarray(rng.standard_normal((2, 2, 4096))
                          .astype(np.float32)) for _ in range(6)]
    expect = [np.asarray(sep._fetch_device(sep._dispatch_device(c), None))
              for c in chunks]

    results = [None] * len(chunks)
    errs = []

    def worker(i):
        try:
            devs = sep._dispatch_device(chunks[i])
            results[i] = np.asarray(sep._fetch_device(devs, None))
        except Exception as e:  # pragma: no cover - failure path
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(chunks))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for got, ref in zip(results, expect):
        np.testing.assert_allclose(got, ref, atol=0)
    # params untouched by dispatch (the r4 bug left the LAST tree here)
    assert float(sep.params["w"]) == float(sep._trees[0]["w"]) == 1.0


def test_pipelined_transfer_matches_serial():
    """pipeline_depth > 1 (async dispatch-ahead) must be bit-identical
    to the serial path — only the dispatch/fetch interleaving changes."""
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal((2, 40000)) * 0.3).astype(np.float32)
    base = ApplyOptions(segment_samples=4096, batch_size=2, shift_offset=33,
                        max_shift_secs=0.02)
    import dataclasses
    serial = Separator(_identity_model, {}, 3,
                       dataclasses.replace(base, pipeline_depth=1))
    piped = Separator(_identity_model, {}, 3,
                      dataclasses.replace(base, pipeline_depth=3))
    np.testing.assert_array_equal(serial(audio), piped(audio))


def test_int16_transfer_within_quantization_budget():
    """transfer_int16 quantizes stems on device; the end-to-end error
    must stay at the PCM16 step (8/32767 in the normalized domain,
    scaled back by the track std). The 2x stem reaches ~8.7 sigma at
    rare peaks — inside the ±8 headroom except a handful of samples,
    which the atol absorbs via the overlap-add averaging."""
    from demucs_tpu.pipeline import PCM16_TRANSFER_SCALE

    rng = np.random.default_rng(8)
    audio = (rng.standard_normal((2, 30000)) * 0.3).astype(np.float32)
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=0)
    import dataclasses
    exact = Separator(_identity_model, {}, 3, base)(audio)
    quant = Separator(_identity_model, {}, 3,
                      dataclasses.replace(base, transfer_int16=True))(audio)
    # identity stems (0, 2) live well inside the ±8-sigma headroom:
    # error bounded by one quantization step times the denorm std
    std = audio.mean(0).std(ddof=1)
    atol = 2.0 / PCM16_TRANSFER_SCALE * max(std, 1.0)
    np.testing.assert_allclose(quant[0], exact[0], atol=atol)
    np.testing.assert_allclose(quant[2], exact[2], atol=atol)
    # the 2x stem is a unit-std Gaussian doubled -> rare ~9-sigma peaks
    # saturate at the ±8 headroom exactly like the final PCM16 WAV
    # would; everything below the clip stays at quantization precision
    err1 = np.abs(quant[1] - exact[1])
    assert (err1 > atol).mean() < 0.02           # only the peak tail clips
    assert err1[np.abs(exact[1]) < 7.5 * std].max() <= atol
    # faithful reconstruction, not a degenerate all-zeros pass
    assert np.abs(quant[0] - audio).max() < 1e-3


def test_fused_track_matches_batched():
    """The fused whole-track device program (on-device split + segment
    graph + weighted overlap-add) must reproduce the host-side batched
    path to float precision — identical math, different placement."""
    import dataclasses
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((2, 50011)) * 0.3).astype(np.float32)
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=55,
                        max_shift_secs=0.02)
    batched = Separator(_identity_model, {}, 3, base)(audio)
    fused = Separator(_identity_model, {}, 3,
                      dataclasses.replace(base, fused_track=True))(audio)
    assert fused.shape == batched.shape == (3, 2, 50011)
    np.testing.assert_allclose(fused, batched, atol=2e-5)


def test_fused_track_int16_and_many():
    import dataclasses
    rng = np.random.default_rng(10)
    tracks = [(rng.standard_normal((2, 30000)) * 0.3).astype(np.float32),
              (rng.standard_normal((2, 30000)) * 0.2).astype(np.float32)]
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=0)
    exact = Separator(_identity_model, {}, 3, base)
    fused = Separator(_identity_model, {}, 3,
                      dataclasses.replace(base, fused_track=True,
                                          transfer_int16=True))
    outs = fused.separate_many(tracks)
    assert len(fused._fused_cache) == 1  # same bucket -> one compile
    for t, o in zip(tracks, outs):
        ref = exact(t)
        std = t.mean(0).std(ddof=1)
        np.testing.assert_allclose(o[0], ref[0], atol=3e-4 * max(std, 1.0))
        np.testing.assert_allclose(o[2], ref[2], atol=3e-4 * max(std, 1.0))


def _positional_model(params, mix):
    """(B, C, T) -> (B, 3, C, T), translation-SENSITIVE: each stem
    delays the input and scales by an absolute intra-segment position
    ramp, so output depends on WHERE content sits inside the segment —
    any divergence between the fused tail padding and
    split_into_segments' symmetric placement shows up immediately."""
    B, C, T = mix.shape
    ramp = 0.5 + jnp.arange(T, dtype=jnp.float32) / (2 * T)
    outs = []
    for s in range(3):
        d = s * 7 + 3
        shifted = jnp.pad(mix, ((0, 0), (0, 0), (d, 0)))[:, :, :T]
        outs.append(shifted * ramp)
    return jnp.stack(outs, axis=1)


def test_fused_track_tail_exact_with_positional_model():
    """The fused program must reproduce the offline tail semantics for
    a NON-stride-multiple track length with a model that cares about
    absolute position (the identity-model test cannot detect a tail
    placement bug)."""
    import dataclasses
    rng = np.random.default_rng(11)
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=17,
                        max_shift_secs=0.02)
    # lengths chosen to land mid-stride (worst-case tail) and just
    # past a stride boundary
    for n in (50011, 3072 * 5 + 1, 9000):
        audio = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
        batched = Separator(_positional_model, {}, 3, base)(audio)
        fused = Separator(_positional_model, {}, 3,
                          dataclasses.replace(base, fused_track=True))(audio)
        assert fused.shape == batched.shape == (3, 2, n)
        np.testing.assert_allclose(fused, batched, atol=3e-5,
                                   err_msg=f"n={n}")


def test_fused_geo_buckets_exact_and_fewer_compiles():
    """fused_buckets='geo': arbitrary lengths share log-many compiled
    programs, and the output still matches the offline batched path
    exactly (the traced-tail program is exact inside its bucket)."""
    import dataclasses
    rng = np.random.default_rng(12)
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=0,
                        max_shift_secs=0.0)
    geo = Separator(_positional_model, {}, 3,
                    dataclasses.replace(base, fused_track=True,
                                        fused_buckets="geo"))
    lengths = [9000, 9500, 10000, 30000, 31000, 33000]
    for n in lengths:
        audio = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
        ref = Separator(_positional_model, {}, 3, base)(audio)
        out = geo(audio)
        np.testing.assert_allclose(out, ref, atol=3e-5, err_msg=f"n={n}")
    # geo grid 1,2,3,4,5,7,9,12: 9000/9500 are 3 segments (bucket 3),
    # 10000 is 4 (bucket 4), 30000-33000 are 10-11 (bucket 12) —
    # six lengths share three compiled programs
    assert len(geo._fused_cache) == 3, list(geo._fused_cache)


def test_sequential_bag_fused_matches_batched():
    """fused_track on the ft bag must still apply the per-stem model
    selection (one fused call per model), not silently run model 0."""
    import dataclasses
    from demucs_tpu.pipeline import SequentialBagSeparator

    def model(params, mix):
        return jnp.stack([mix * params["w"] * (i + 1) for i in range(4)],
                         axis=1)

    trees = [{"w": jnp.asarray(float(m + 1))} for m in range(4)]
    rng = np.random.default_rng(11)
    audio = rng.standard_normal((2, 20000)).astype(np.float32) * 0.3
    base = ApplyOptions(segment_samples=4096, batch_size=4, shift_offset=0)
    ref = SequentialBagSeparator(model, trees, 4, base)(audio)
    fused = SequentialBagSeparator(
        model, trees, 4, dataclasses.replace(base, fused_track=True))(audio)
    np.testing.assert_allclose(fused, ref, atol=2e-5)


# (ShardedSeparator used to reject fused_track; r4 implements it —
# tests/test_parallel.py::test_sharded_separator_fused_matches_batched)
