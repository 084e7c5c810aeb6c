#!/usr/bin/env python
"""Headline benchmark: WSJ0-2mix mixtures/sec/chip, end-to-end
STFT -> BiGRU separator -> masks -> iSTFT at the reference workload shape
(8 kHz, 256/128 STFT, 129 bins x 313 frames, B=16, 2-layer BiGRU-300,
emb 50, 2 speakers — Torch_multi/config.py:98-133).

Baseline = the reference's own architecture run the way the reference runs
it (BASELINE.md): per-utterance CPU numpy STFT/iSTFT feeding a torch CPU
BiGRU forward. vs_baseline = TPU rate / CPU rate.

Prints exactly ONE JSON line on stdout.
"""

import json
import sys
import time

import numpy as np

V5E_BF16_PEAK = 197e12   # TPU v5e bf16 peak FLOP/s (per chip)


def _model_flop_parts():
    """Per-mixture FLOP components of the torch_multi workload, derived
    from the live config (not hardcoded constants). 2 FLOPs per MAC.
    Returns (model_fwd, stft_one_signal, istft_topk) in FLOPs."""
    from dl4ss_tpu import preset
    cfg = preset("torch_multi")
    t, f, h, e = cfg.num_frames, cfg.freq_bins, cfg.hidden_units, \
        cfg.embedding_size
    gates = {"gru": 3, "lstm": 4}[cfg.encoder_rnn]
    model = 0.0
    for layer in range(cfg.encoder_layers):
        d_in = f if layer == 0 else 2 * h
        # per step per direction: x@W (d_in x G*H) + h@U (H x G*H)
        model += 2 * t * 2 * (d_in + h) * gates * h
    model += 2 * t * (2 * h) * (f * e)          # Dense 2H -> F*E projection
    model += 2 * cfg.top_k * t * f * e          # mask-head E-contraction
    # DFT matmuls: T frames x (frame_length x 2*freq_bins) per signal
    stft_one = 2 * t * cfg.frame_length * (2 * f)
    istft_topk = 2 * cfg.top_k * t * cfg.frame_length * (2 * f)
    return model, stft_one, istft_topk, cfg


def model_gflops_per_mixture() -> float:
    """Model math per mixture of the benched INFERENCE pipeline: model
    forward + STFT of the mix + iSTFT of the top_k channels."""
    model, stft_one, istft_topk, _ = _model_flop_parts()
    return (model + stft_one + istft_topk) / 1e9


def train_gflops_per_mixture() -> float:
    """Model math per mixture of the benched fused TRAIN step (VERDICT r4
    weak #6): forward + backward (2x forward for the matmul-dominated
    model: dL/dX and dL/dW each cost one fwd-sized contraction) + the
    featurization STFTs of the mixture and its max_mix sources (inputs and
    loss targets — no gradient flows through them; the default torch_multi
    loss is spectral PIT MSE, so no iSTFT in the loss path)."""
    model, stft_one, _, cfg = _model_flop_parts()
    return (3 * model + (1 + cfg.max_mix) * stft_one) / 1e9


B = 16            # CPU-reference batch (as the reference runs, B=16)
CHECK_TOLS = {    # max-abs-err tolerances for the on-chip kernel self-check
    "gru_fwd": 2e-2, "gru_grad": 2e-2,      # bf16 single-pass MXU tiles vs
    "lstm_fwd": 2e-2, "lstm_grad": 2e-2,    # the scan path's identical math
    "stft": 1e-3,                            # f32 HIGHEST DSP matmuls
    "stft_features": 1e-3, "masked_istft": 1e-3,
    "maskhead_fwd": 2e-2, "maskhead_grad": 5e-2,
}
TPU_B = 256       # TPU throughput batch. The round-2 VMEM cliff above
                  # B=208 was the XLA (B,T,F,E) embedding-grid
                  # materialization; the fused Pallas mask head removes it
                  # and the sweep now peaks at B=256 (docs/BENCHMARKS.md)
N_SAMPLES = 40000
RATE_ITERS = 30


def tpu_pipeline_rate(batch: int, bf16: bool):
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.models import init_separator, separate
    from dl4ss_tpu.ops import istft, magnitude_and_phase, stft

    # the torch_multi preset ships the full Pallas kernel suite: fused-gate
    # RNN scans, fused STFT features, the fused proj+dot+sigmoid mask head,
    # and the fused masked-iSTFT resynthesis (docs/BENCHMARKS.md round-3)
    cfg = preset("torch_multi").replace(batch_size=batch)
    params = init_separator(jax.random.PRNGKey(0), cfg)
    if bf16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(
        rng.standard_normal((batch, N_SAMPLES)).astype(np.float32))
    spk_idx = jnp.asarray(rng.integers(0, cfg.num_speakers, (batch, 2)))

    if cfg.use_pallas_stft:
        # phasor-free pipeline: mask (.) |X| . e^{j angle X} == mask (.) X,
        # so the fused feature kernel hands (mag, Re X, Im X) straight to
        # the fused masked-iSTFT — no magnitude division, no complex
        # multiply, no pred materialization (XLA DCEs out.pred)
        from dl4ss_tpu.ops.pallas_stft import (pallas_masked_istft,
                                               pallas_stft_features)

        @jax.jit
        def forward(wav):
            feat, re, im = pallas_stft_features(
                wav, cfg.frame_length, cfg.frame_shift,
                feat_dtype=jnp.bfloat16 if bf16 else jnp.float32)
            out = separate(params, feat, cfg, spk_idx=spk_idx)
            sep = pallas_masked_istft(re, im, out.masks, cfg.frame_length,
                                      cfg.frame_shift, length=N_SAMPLES)
            # feed the output back so successive iterations serialize — on
            # this backend block_until_ready does not reliably block; only a
            # host value fetch forces the chain, so the timing loop is a
            # dependent chain closed by one float() fetch.
            return wav + 1e-9 * sep[:, 0]
    else:
        @jax.jit
        def forward(wav):
            spec = stft(wav, cfg.frame_length, cfg.frame_shift)
            mag, phasor = magnitude_and_phase(spec)
            feat = mag.astype(jnp.bfloat16) if bf16 else mag
            out = separate(params, feat, cfg, spk_idx=spk_idx)
            sep = istft(out.pred.astype(jnp.float32) * phasor[:, None],
                        cfg.frame_length, cfg.frame_shift, length=N_SAMPLES)
            return wav + 1e-9 * sep[:, 0]

    x = forward(wavs)
    assert np.isfinite(float(jnp.sum(x)))
    t0 = time.perf_counter()
    for _ in range(RATE_ITERS):
        x = forward(x)
    _ = float(jnp.sum(x))
    dt = (time.perf_counter() - t0) / RATE_ITERS
    return batch / dt, dt


def _build_serve():
    """The B=1 bf16 serving program shared by the per-request and pipelined
    measurements: wav -> fused STFT features -> separator -> fused masked
    iSTFT -> scalar (the host-fetchable request result)."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.models import init_separator, separate
    from dl4ss_tpu.ops.pallas_stft import (pallas_masked_istft,
                                           pallas_stft_features)
    cfg = preset("torch_multi").replace(batch_size=1)
    params = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16),
        init_separator(jax.random.PRNGKey(0), cfg))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, N_SAMPLES)).astype(np.float32))
    spk_idx = jnp.asarray(rng.integers(0, cfg.num_speakers, (1, 2)))

    @jax.jit
    def serve(w):
        feat, re, im = pallas_stft_features(
            w, cfg.frame_length, cfg.frame_shift, feat_dtype=jnp.bfloat16)
        out = separate(params, feat, cfg, spk_idx=spk_idx)
        sep = pallas_masked_istft(re, im, out.masks, cfg.frame_length,
                                  cfg.frame_shift, length=N_SAMPLES)
        return jnp.sum(sep[:, 0])

    _ = float(serve(wav))                        # compile + warm
    return serve, wav


def dispatch_floor(iters: int = 200):
    """The platform's per-request floor: ONE trivial jitted op closed by a
    host fetch per iteration — the dispatch + device round trip + fetch
    cost that every synchronous request pays regardless of compute
    (VERDICT r4 weak #1). Returns (p50, p95) seconds."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def noop(x):
        return x + 1.0

    x = jnp.zeros((1,), jnp.float32)
    _ = float(noop(x)[0])
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(noop(x)[0])
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.asarray(lat))
    return (float(lat[int(0.50 * iters)]), float(lat[int(0.95 * iters)]))


def serving_pipelined(iters: int = 200, depth: int = 4):
    """Pipelined serving loop (VERDICT r4 next-step #2): keep `depth`
    requests in flight — dispatch request N before fetching request
    N-depth, so the host fetch round trip of one request overlaps the
    device compute AND dispatch of the next ones (JAX dispatch is async;
    only the float() fetch blocks). Returns (sustained requests/s,
    p50, p95 per-request dispatch->fetch latency in seconds)."""
    from collections import deque
    serve, wav = _build_serve()
    inflight = deque()
    lat = []
    t_start = time.perf_counter()
    for i in range(iters + depth):
        if i < iters:
            inflight.append((time.perf_counter(), serve(wav)))
        if len(inflight) > depth or i >= iters:
            t0, r = inflight.popleft()
            _ = float(r)
            lat.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_start
    lat = np.sort(np.asarray(lat))
    return (iters / total,
            float(lat[int(0.50 * len(lat))]),
            float(lat[int(0.95 * len(lat))]))


def serving_percentiles(iters: int = 200):
    """Per-REQUEST B=1 latency distribution: each iteration is closed by its
    own host fetch (what a SYNCHRONOUS serving loop does), so unlike the
    chained mean above this includes the dispatch + fetch round trip and is
    robust to host-load jitter via percentiles (VERDICT r3 weak #6)."""
    serve, wav = _build_serve()
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(serve(wav))                    # fetch closes every request
        lat.append(time.perf_counter() - t0)
    lat = np.sort(np.asarray(lat))
    return (float(lat[int(0.50 * iters)]), float(lat[int(0.95 * iters)]))


def cpu_reference_rate(max_batches=3, num_threads=None):
    """The reference's own pipeline shape on CPU: numpy STFT (librosa
    equivalent), torch BiGRU encoder + embedding-dot masks, numpy iSTFT.

    num_threads=None keeps torch's default (all cores) — the FAIR baseline
    used for vs_baseline; pass 1 for the reference's literal single-process
    behavior (reported alongside, see BASELINE.md).
    """
    import torch

    hidden, emb, freq, n_fft, hop = 300, 50, 129, 256, 128
    if num_threads is not None:
        torch.set_num_threads(num_threads)
    enc = torch.nn.GRU(freq, hidden, 2, batch_first=True, bidirectional=True)
    proj = torch.nn.Linear(2 * hidden, freq * emb)
    table = torch.randn(103, emb)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((B, N_SAMPLES)).astype(np.float32)

    def np_stft(x):
        xp = np.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
        t = 1 + (len(xp) - n_fft) // hop
        frames = np.stack([xp[i * hop:i * hop + n_fft] for i in range(t)])
        return np.fft.rfft(frames * win, axis=-1)

    def np_istft(spec):
        frames = np.fft.irfft(spec, n=n_fft, axis=-1) * win
        t = spec.shape[0]
        out = np.zeros((t - 1) * hop + n_fft)
        wsum = np.zeros_like(out)
        for i in range(t):
            out[i * hop:i * hop + n_fft] += frames[i]
            wsum[i * hop:i * hop + n_fft] += win ** 2
        nz = wsum > 1e-10
        out[nz] /= wsum[nz]
        return out[n_fft // 2:-(n_fft // 2)]

    best_dt = float("inf")
    with torch.no_grad():
        for _ in range(max_batches):
            t0 = time.perf_counter()
            specs = [np_stft(w) for w in wavs]              # CPU hot loop #1
            mags = torch.tensor(np.abs(np.stack(specs)), dtype=torch.float32)
            h, _ = enc(mags)
            grid = torch.tanh(proj(h)).reshape(B, -1, freq, emb)
            q = table[np.stack([rng.integers(0, 103, 2) for _ in range(B)])]
            masks = torch.sigmoid(torch.einsum("btfe,bke->bktf", grid, q))
            pred = (masks * mags[:, None]).numpy()
            for bi in range(B):                             # CPU hot loop #2
                for ki in range(2):
                    np_istft(pred[bi, ki] * np.exp(1j * np.angle(specs[bi])))
            # take the baseline's BEST batch (fastest) -> the speedup claim
            # is conservative against host-load noise
            best_dt = min(best_dt, (time.perf_counter() - t0) / B)
    return 1.0 / best_dt, best_dt


def run_checks():
    """On-TPU parity self-check (VERDICT r2 weak #3): every Pallas kernel
    vs its scan/XLA reference ON THE LIVE CHIP (the CPU test suite only
    exercises the interpreter), asserted under CHECK_TOLS and printed to
    stderr. Runs by default before timing."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu.ops.pallas_maskhead import _reference_impl, fused_dot_masks
    from dl4ss_tpu.ops.pallas_stft import pallas_stft
    from dl4ss_tpu.ops.rnn import bidirectional_rnn, rnn_init
    from dl4ss_tpu.ops.stft import stft

    rng = np.random.default_rng(7)
    results = {}

    def record(name, a, b):
        err = float(np.max(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64))))
        results[name] = err
        tol = CHECK_TOLS[name]
        status = "ok" if err <= tol else "FAIL"
        print(f"check {name:14s} max|err| {err:.2e} (tol {tol:.0e}) "
              f"{status}", file=sys.stderr)
        assert err <= tol, f"{name}: {err} > {tol}"

    # --- RNN fwd + grads: fused Pallas vs lax.scan, reference shape ---
    x = jnp.asarray(rng.standard_normal((8, 96, 129)).astype(np.float32))
    for cell in ("gru", "lstm"):
        layers = rnn_init(jax.random.PRNGKey(3), cell, 129, 300, 2,
                          bidirectional=True)

        def loss(p, use_pallas):
            h = bidirectional_rnn(p, x, cell, use_pallas=use_pallas)
            return jnp.sum(h ** 2) / h.size, h

        (l1, h1), g1 = jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True)(layers)
        (l2, h2), g2 = jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True)(layers)
        record(f"{cell}_fwd", h1, h2)
        flat1 = np.concatenate([np.ravel(v) for v in
                                jax.tree_util.tree_leaves(g1)])
        flat2 = np.concatenate([np.ravel(v) for v in
                                jax.tree_util.tree_leaves(g2)])
        record(f"{cell}_grad", flat1, flat2)

    # --- STFT: fused Pallas frame+window+DFT vs the XLA matmul-DFT ---
    wav = jnp.asarray(rng.standard_normal((4, 8000)).astype(np.float32))
    ours = pallas_stft(wav)
    ref = stft(wav)
    # complex->host transfer is unimplemented on this backend: compare
    # magnitudes (the same check tests/test_pallas.py runs off-chip)
    record("stft", jnp.abs(ours), jnp.abs(ref))

    # --- fused (mag, Re, Im) feature kernel + fused masked-iSTFT vs the
    # XLA stft -> phasor -> istft resynthesis chain ---
    from dl4ss_tpu.ops.pallas_stft import (pallas_masked_istft,
                                           pallas_stft_features)
    from dl4ss_tpu.ops.stft import istft, magnitude_and_phase
    mag_f, re_f, im_f = pallas_stft_features(wav)
    record("stft_features",
           jnp.concatenate([mag_f, re_f, im_f], -1),
           jnp.concatenate([jnp.abs(ref), jnp.real(ref), jnp.imag(ref)], -1))
    t_frames, f_bins = ref.shape[1], ref.shape[2]
    masks = jnp.asarray(
        rng.uniform(0, 1, (4, 2, t_frames, f_bins)).astype(np.float32))
    ours_w = pallas_masked_istft(re_f, im_f, masks, length=8000)
    magn, phasor = magnitude_and_phase(ref)
    ref_w = istft((masks * magn[:, None]) * phasor[:, None], length=8000)
    record("masked_istft", ours_w, ref_w)

    # --- fused mask head fwd + grads vs the XLA embedding-grid path ---
    hid = jnp.asarray(rng.standard_normal((4, 96, 600)).astype(np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((600, 129 * 50))
                    .astype(np.float32))
    bias = jnp.asarray(0.05 * rng.standard_normal(129 * 50)
                       .astype(np.float32))
    q = jnp.asarray(rng.standard_normal((4, 2, 50)).astype(np.float32))
    m1 = fused_dot_masks(hid, w, bias, q, 129, 50)
    m2 = _reference_impl(hid, w, bias, q, 129, 50)
    record("maskhead_fwd", m1, m2)
    g1 = jax.grad(lambda h: jnp.sum(
        fused_dot_masks(h, w, bias, q, 129, 50) ** 2))(hid)
    g2 = jax.grad(lambda h: jnp.sum(
        _reference_impl(h, w, bias, q, 129, 50) ** 2))(hid)
    record("maskhead_grad", g1, g2)
    return results


def tpu_train_rate(batch: int = 128):
    """Fused train step (synthesis + STFT + fwd/bwd + Adam in one jit),
    bf16 mixed precision — carried in the bench artifact so a training
    regression is visible, not just an inference one (VERDICT r2 weak #6)."""
    import jax
    import jax.numpy as jnp
    from dl4ss_tpu import preset
    from dl4ss_tpu.data.synth import make_synthetic_bank
    from dl4ss_tpu.train.state import create_train_state
    from dl4ss_tpu.train.steps import make_fused_step

    cfg = preset("torch_multi").replace(batch_size=batch,
                                        compute_dtype="bfloat16")
    bank = jnp.asarray(make_synthetic_bank(0, cfg.num_speakers, 4,
                                           cfg.max_len))
    state = create_train_state(jax.random.PRNGKey(0), cfg,
                               steps_per_epoch=100)
    step = make_fused_step(cfg, 100)
    state, _ = step(state, bank)                 # compile + warm
    assert np.isfinite(float(state.step))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, _ = step(state, bank)
    _ = float(state.step)                        # host fetch closes the chain
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def main():
    if "--check" in sys.argv or "--no-check" not in sys.argv:
        run_checks()
    if "--check" in sys.argv:   # check-only mode
        print(json.dumps({"metric": "kernel self-check", "value": 1,
                          "unit": "pass", "vs_baseline": 1}))
        return
    rate_ref, dt_ref = tpu_pipeline_rate(B, bf16=False)      # reference shape
    rate_big, dt_big = tpu_pipeline_rate(TPU_B, bf16=True)   # throughput cfg
    _, serve_dt = tpu_pipeline_rate(1, bf16=True)            # serving latency
    floor_p50, floor_p95 = dispatch_floor()                  # platform floor
    serve_p50, serve_p95 = serving_percentiles()             # per-request
    pipe_rps, pipe_p50, pipe_p95 = serving_pipelined()       # pipelined loop
    train_rate, train_dt = tpu_train_rate()
    # Fair baseline: torch default threading (all cores). The reference's
    # literal single-threaded rate is also measured and logged to stderr so
    # both numbers stay on record (VERDICT r1 weak #1).
    cpu_rate, _ = cpu_reference_rate()
    cpu_rate_1t, _ = cpu_reference_rate(num_threads=1)
    print(f"tpu f32  B={B}: {rate_ref:.1f} mixtures/s ({dt_ref*1e3:.2f} ms); "
          f"tpu bf16 B={TPU_B}: {rate_big:.1f} mixtures/s "
          f"({dt_big*1e3:.2f} ms); serve latency B=1 bf16: "
          f"{serve_dt*1e3:.2f} ms chained / per-request p50 "
          f"{serve_p50*1e3:.2f} p95 {serve_p95*1e3:.2f} ms; "
          f"dispatch floor (no-op jit + fetch) p50 {floor_p50*1e3:.2f} "
          f"p95 {floor_p95*1e3:.2f} ms; pipelined serving (depth 4): "
          f"{pipe_rps:.1f} req/s, p50 {pipe_p50*1e3:.2f} "
          f"p95 {pipe_p95*1e3:.2f} ms; "
          f"fused train step bf16 B=128: "
          f"{train_rate:.1f} mixtures/s ({train_dt*1e3:.2f} ms); "
          f"cpu reference (default threads): "
          f"{cpu_rate:.2f} mixtures/s; cpu reference (1 thread): "
          f"{cpu_rate_1t:.2f} mixtures/s",
          file=sys.stderr)
    best = max(rate_ref, rate_big)
    # MFU is defined for the bf16 throughput run specifically (dividing an
    # f32 rate by the bf16 peak would mislabel it if rate_ref ever won);
    # the FLOP count is derived from the live config so a preset/shape
    # change can never silently stale it (at the shipped torch_multi shape
    # this evaluates to the documented 4.05 GFLOP/mixture)
    gflop = model_gflops_per_mixture()
    mfu = rate_big * gflop * 1e9 / V5E_BF16_PEAK
    train_gflop = train_gflops_per_mixture()
    train_mfu = train_rate * train_gflop * 1e9 / V5E_BF16_PEAK
    print(json.dumps({
        "metric": "wsj0-2mix mixtures/sec/chip (stft->bigru->mask->istft)",
        "value": round(best, 1),
        "unit": "mixtures/s",
        "vs_baseline": round(best / cpu_rate, 1),
        "train_step_mix_s": round(train_rate, 1),
        "serve_latency_ms": round(serve_dt * 1e3, 2),
        "serve_p50_ms": round(serve_p50 * 1e3, 2),   # per-request, incl.
        "serve_p95_ms": round(serve_p95 * 1e3, 2),   # dispatch+fetch RTT
        "dispatch_floor_p50_ms": round(floor_p50 * 1e3, 2),  # no-op jit RTT
        "serve_pipelined_rps": round(pipe_rps, 1),   # depth-4 in flight
        "serve_pipelined_p50_ms": round(pipe_p50 * 1e3, 2),
        "serve_pipelined_p95_ms": round(pipe_p95 * 1e3, 2),
        "mfu_pct": round(100 * mfu, 1),
        "mfu_rate_mix_s": round(rate_big, 1),   # the rate MFU divides
        "mfu_gflop_per_mix": round(gflop, 2),
        "train_mfu_pct": round(100 * train_mfu, 1),  # fused step fwd+bwd
        "train_gflop_per_mix": round(train_gflop, 2),
    }))


if __name__ == "__main__":
    main()
