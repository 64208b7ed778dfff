"""Benchmark: bmshj2018 encode+decode throughput on Kodak-sized images.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.md) is bmshj2018 end-to-end
encode+decode images/sec/chip on 768x512 (Kodak-sized) inputs: device
transforms + host-side native range coding, i.e. the full compress() /
decompress() product path including bitstream (de)serialization.

``vs_baseline`` semantics (ONE documented meaning, all rounds): the true
baseline (reference TFC on CPU) is unmeasurable in this sandbox — the
reference mount is empty and there is no network (BASELINE.md provenance
note). The defined stand-in is this framework's OWN round-1
driver-recorded number (BENCH_r01.json: 2.342 img/s on the same tunneled
chip), so vs_baseline = end_to_end / 2.342 reads as "speedup over the
round-1 framework on identical hardware", NOT "speedup over the
reference".

Round-comparability fields (VERDICT r3 item 3): the tunneled chip's host
link bandwidth varies ~4x day to day, which made successive rounds'
end-to-end numbers compare weather, not code. The JSON line therefore
also carries:
  - ``link_h2d_MBps`` / ``link_d2h_MBps``: a measured fixed-size (8 MB)
    transfer probe, so any end-to-end regression can be attributed (or
    not) to the link;
  - ``compute_only``: img/s of the device-RESIDENT encode+decode chain —
    transforms + on-device rANS entropy coding of y, input staged to HBM
    before timing, nothing but scalars crossing the link (z's host range
    coding, blob framing, and all image/stream transfers excluded). This
    is the link-independent number successive rounds can be compared on.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 driver artifact (BENCH_r01.json) on the same tunneled v5e chip —
# the documented vs_baseline divisor until the reference itself can be timed.
BASELINE_IMG_PER_S = 2.342


def link_probe(reps: int = 5, mb: int = 8):
    """Measured host<->device bandwidth: median time to move one fixed-size
    (default 8 MB) float32 buffer each way. Makes the dominant stage of the
    tunneled end-to-end number attributable — BENCH artifacts from
    different days can be compared by first comparing their link rows."""
    import jax

    dev = jax.devices()[0]
    buf = np.zeros((mb * 1024 * 1024 // 4,), np.float32)
    nbytes = buf.nbytes
    # Warm both directions (allocator, tunnel setup).
    a = jax.device_put(buf, dev)
    a.block_until_ready()
    np.asarray(jax.device_get(a))
    h2d, d2h = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        a = jax.device_put(buf, dev)
        a.block_until_ready()
        h2d.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(a))
        d2h.append(time.perf_counter() - t0)
    scale = nbytes / (1024 * 1024)
    return scale / float(np.median(h2d)), scale / float(np.median(d2h))


def bmshj2018_flops_per_image(cfg, h: int, w: int) -> float:
    """Analytic FLOPs of the device-resident encode+decode chain per image:
    analysis + GDNs + hyper-analysis + hyper-synthesis + synthesis + IGDNs
    (conv MACs * 2; rANS and gathers excluded — they are measured as time,
    not FLOPs). Counted from the model topology (models/bmshj2018.py
    Analysis/Synthesis/Hyper transforms), not hand-entered constants, so a
    config change re-counts itself."""
    F, M, Hf = cfg.num_filters, cfg.num_latents, cfg.num_hyperlatents
    macs = 0
    # Analysis: 4x (5x5 conv stride-down 2) with GDN after the first 3.
    chans = [(3, F), (F, F), (F, F), (F, M)]
    hh, ww = h, w
    for i, (ci, co) in enumerate(chans):
        hh, ww = hh // 2, ww // 2
        macs += hh * ww * ci * co * 25
        if i < 3:
            macs += hh * ww * co * co  # GDN: FxF mixing per position
    # Synthesis: mirror (transposed conv MACs = Hin*Win*cin*cout*k*k).
    chans = [(M, F), (F, F), (F, F), (F, 3)]
    hh, ww = h // 16, w // 16
    for i, (ci, co) in enumerate(chans):
        macs += hh * ww * ci * co * 25
        hh, ww = hh * 2, ww * 2
        if i < 3:
            macs += hh * ww * co * co  # IGDN
    # Hyper-analysis: 3x3 M->F @ /16; 5x5/2 F->F @ /32; 5x5/2 F->Hf @ /64.
    macs += (h // 16) * (w // 16) * M * F * 9
    macs += (h // 32) * (w // 32) * F * F * 25
    macs += (h // 64) * (w // 64) * F * Hf * 25
    # Hyper-synthesis: 5x5 up Hf->F @ /64 in; 5x5 up F->F @ /32 in;
    # 3x3 F->M @ /16.
    macs += (h // 64) * (w // 64) * Hf * F * 25
    macs += (h // 32) * (w // 32) * F * F * 25
    macs += (h // 16) * (w // 16) * F * M * 9
    return 2.0 * macs


# Public bf16 peak of one TPU v5e (v5litepod) chip; override with
# TPC_PEAK_FLOPS when benching other hardware. MFU against bf16 peak is
# the honest denominator here: JAX's DEFAULT matmul precision runs f32
# convs as one-pass bf16 multiplies on the MXU.
PEAK_FLOPS_BF16 = 197e12


def compute_only_metric(codec, images: np.ndarray, rounds: int, k=None):
    """img/s of the device-resident encode+decode chain (link excluded).

    Mirrors the device-coder product path's device work exactly —
    analysis front -> hyper synthesis -> CDF row indexes -> K-lane rANS
    encode of y -> rANS decode -> synthesis — but the input batch is
    staged to HBM before the clock starts, the rANS words stay on device
    (the decoder consumes the encoder's stream buffer directly), and only
    the per-image word counts (scalars) are fetched to assert success.
    Excluded, by construction: z's host range coding (tiny), blob
    framing, and every image/stream/CDF transfer. This is the
    link-independent metric (VERDICT r3 item 3b)."""
    import jax
    import jax.numpy as jnp

    x, _hw = codec._pad_np(np.asarray(images, np.uint8), codec.cfg.downscale)
    x_dev = jax.device_put(jnp.asarray(x))
    n = x.shape[0]
    # The decoder consumes a power-of-two stream bucket, as the product
    # path does (device_coding.pad_words) — NOT the encoder's worst-case
    # capacity buffer, whose width would turn every per-step gather into
    # an HBM-resident one the product decode never performs. The bucket
    # is sized once from a warmup encode's actual lengths.
    bucket = {}

    def once():
        _y8, _y16, _z16, z_hat, _fits, y32, _z32 = codec._front(
            codec._p, x_dev
        )
        sigma = codec._sigma(z_hat)
        rows = codec.em.rows(sigma)
        N = int(np.prod(sigma.shape[1:]))
        enc, dec, _K, _cap = codec._rans(N, k)
        ri = rows.astype(jnp.int32).reshape(n, -1)
        stream, lengths, overflow = enc(y32.reshape(n, -1), ri)
        if not bucket:
            cap = 1024
            longest = int(np.max(np.asarray(lengths)))
            while cap < longest:
                cap *= 2
            bucket["cap"] = cap
        values, ok = dec(stream[:, : bucket["cap"]], ri)
        x_hat = codec._synthesize(values.reshape(sigma.shape))
        return x_hat, lengths, overflow, ok

    # Warmup: compiles the chain (the dec jit at the bucket width is a
    # fresh program) and validates the round trip once.
    x_hat, lengths, overflow, ok = once()
    x_hat.block_until_ready()
    assert not bool(np.any(np.asarray(overflow))), "rANS capacity overflow"
    assert bool(np.all(np.asarray(ok))), "device roundtrip failed"
    t0 = time.perf_counter()
    for _ in range(rounds):
        x_hat, lengths, overflow, ok = once()
    x_hat.block_until_ready()
    lengths.block_until_ready()
    dt = time.perf_counter() - t0

    # Per-stage attribution inside the compute-only chain (VERDICT r4
    # weak #1: without a transforms-vs-coder split, the next optimization
    # target is a guess). Each sub-chain is timed on the SAME compiled
    # programs with warm inputs; ms are per n-image batch.
    def _stage(fn, key, stages):
        out = fn()  # everything is already compiled; one sync warm call
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn()
        jax.block_until_ready(out)
        stages[key] = (time.perf_counter() - t0) / rounds * 1e3

    _y8, _y16, _z16, z_hat_w, _fits, y32_w, _z32 = codec._front(
        codec._p, x_dev
    )
    sigma_w = codec._sigma(z_hat_w)
    rows_w = codec.em.rows(sigma_w)
    N = int(np.prod(sigma_w.shape[1:]))
    enc, dec, _K, _cap = codec._rans(N, k)
    ri_w = rows_w.astype(jnp.int32).reshape(n, -1)
    stream_w, _len_w, _ovf_w = enc(y32_w.reshape(n, -1), ri_w)
    stream_b = stream_w[:, : bucket["cap"]]
    values_w, _ok_w = dec(stream_b, ri_w)
    stages = {}
    _stage(lambda: codec._front(codec._p, x_dev), "front", stages)
    _stage(
        lambda: codec.em.rows(codec._sigma(z_hat_w)), "sigma_rows", stages
    )
    _stage(lambda: enc(y32_w.reshape(n, -1), ri_w), "rans_enc", stages)
    _stage(lambda: dec(stream_b, ri_w), "rans_dec", stages)
    _stage(
        lambda: codec._synthesize(values_w.reshape(sigma_w.shape)),
        "synth", stages,
    )
    return rounds * n / dt, stages


def pick_checkpoint(tiny: bool) -> str:
    """Measured-checkpoint selection, in preference order: the product
    checkpoint in the model cache; the repo-committed fallback (VM rebuilds
    wipe everything outside the repo, and the driver's round-end bench must
    still measure a *trained* codec's symbol statistics); else a path whose
    absence triggers the 60-step quick-train."""
    import os

    if tiny:
        return "/tmp/tpc_bench_ckpt_tiny.msgpack"
    from compression_tpu.cli import registry

    product = os.path.join(registry.model_dir(), "bmshj2018.msgpack")
    if os.path.exists(product):
        return product
    repo_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ckpt", "bmshj2018.msgpack"
    )
    if os.path.exists(repo_ckpt):
        return repo_ckpt
    return "/tmp/tpc_bench_ckpt.msgpack"


def main():
    import os

    # The tunnel environment pins JAX_PLATFORMS to the accelerator platform
    # only (e.g. "axon"), which leaves the host CPU backend unregistered —
    # but the bench pins init/host work to jax.local_devices(backend="cpu").
    # Append "cpu" (keeping the accelerator first, so jax.devices() still
    # selects the chip) BEFORE jax reads the env at import. An explicit
    # JAX_PLATFORMS=cpu smoke run is left untouched.
    _plats = os.environ.get("JAX_PLATFORMS")
    if _plats and "cpu" not in [p.strip() for p in _plats.split(",")]:
        os.environ["JAX_PLATFORMS"] = _plats + ",cpu"

    import jax

    from compression_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()

    from compression_tpu.models import bmshj2018

    # TPC_BENCH_TINY=1: shrunken end-to-end smoke of the bench plumbing
    # (CI / CPU); the reported number is NOT the product metric then.
    tiny = os.environ.get("TPC_BENCH_TINY") == "1"
    cfg = (
        bmshj2018.Config(num_filters=8, num_latents=8, num_hyperlatents=4)
        if tiny
        else bmshj2018.Config()
    )
    model = bmshj2018.BMSHJ2018Model(cfg)
    # Structured synthetic image (gradients + texture + edges): natural-ish
    # statistics. White noise would flood the coder's escape path and
    # measure a pathological case instead of codec throughput.
    h, w = (128, 192) if tiny else (512, 768)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    image = np.stack(
        [
            xx / w * 255,
            yy / h * 255,
            (np.sin(xx / 17) * np.cos(yy / 23) * 0.5 + 0.5) * 255,
        ],
        -1,
    )
    image[128:256, 192:448] = [255, 64, 32]
    image = np.clip(
        image + np.random.RandomState(0).randn(h, w, 3) * 4, 0, 255
    ).astype(np.uint8)
    x0 = np.zeros((1, h, w, 3), np.float32)
    # Init on host CPU (values are arbitrary for a throughput bench; no
    # need to compile the init program for the accelerator). The codec jits
    # close over the params, so they are shipped to the device once.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), x0, jax.random.PRNGKey(1), training=True
        )

    # A random-init model floods the range coder's escape path (every
    # symbol out of range), understating real throughput ~2x. Prefer the
    # REAL product checkpoint (tfci-trained bmshj2018) when one exists so
    # symbol statistics are a trained codec's; otherwise briefly train once
    # and cache (only the first-ever bench run on a host pays this).
    from compression_tpu.models import common

    ckpt = pick_checkpoint(tiny)
    import sys as _sys

    print(f"bench checkpoint: {ckpt}", file=_sys.stderr)
    if os.path.exists(ckpt):
        params, _ = common.load_checkpoint(ckpt, params)
    else:
        import contextlib
        import sys

        tc = common.TrainConfig(
            train_glob=None, batch_size=2, patch_size=128,
            steps=5 if tiny else 60, log_every=60,
        )
        # stdout must stay clean: the driver parses the single JSON line.
        with contextlib.redirect_stdout(sys.stderr):
            _, params = bmshj2018.train(cfg, tc, params=params)
        common.save_checkpoint(ckpt, params, step=60)

    # Un-commit from the CPU: closed-over params committed to another
    # device would drag the codec jits off the accelerator.
    params = jax.device_put(params, jax.devices()[0])

    # Persist range-coder tables keyed by the checkpoint identity.
    from compression_tpu.models.codec_cache import register_table_cache

    st = os.stat(ckpt)
    register_table_cache(params, f"{ckpt}.{st.st_mtime_ns}.tables.npz")

    # Batched serving path: N images per device dispatch, native coder
    # fanning streams across host threads, double-buffered so the TPU
    # transforms batch i+1 while the host range-codes batch i.
    import sys

    batch = 8
    images = np.stack([image] * batch)
    codec = bmshj2018.make_codec(model, params)

    # Warmup (compiles transforms; builds CDF tables once).
    blobs = codec.compress_batch(images)
    out = codec.decompress_batch(blobs)
    assert out.shape == images.shape

    # TPC_BENCH_MODE=latency: single-image serving latency (batch 1, no
    # pipelining) instead of the default batched-throughput metric — the
    # reference's CLI use case is one image per invocation, so p50 encode
    # and decode latency is the serving-side complement to img/s. Prints
    # the same one-JSON-line contract with a latency metric name.
    if os.environ.get("TPC_BENCH_MODE") == "latency":
        one = images[:1]
        lat_results = {}
        for coder in ["host", "device"]:
            try:
                warm = list(codec.compress_iter(iter([one]), depth=1, coder=coder))
                list(codec.decompress_iter(iter(warm), depth=1))
                enc_ms, dec_ms = [], []
                for _ in range(3 if tiny else 10):
                    t0 = time.perf_counter()
                    blobs = list(
                        codec.compress_iter(iter([one]), depth=1, coder=coder)
                    )
                    t1 = time.perf_counter()
                    out = list(codec.decompress_iter(iter(blobs), depth=1))
                    t2 = time.perf_counter()
                    assert out[0].shape == one.shape
                    enc_ms.append((t1 - t0) * 1e3)
                    dec_ms.append((t2 - t1) * 1e3)
                p50 = float(np.median(enc_ms) + np.median(dec_ms))
                print(
                    f"latency coder={coder}: enc p50 {np.median(enc_ms):.1f} ms, "
                    f"dec p50 {np.median(dec_ms):.1f} ms",
                    file=sys.stderr,
                )
                lat_results[coder] = p50
            except Exception as e:
                print(f"latency coder {coder!r} failed: {e!r}", file=sys.stderr)
        if not lat_results:
            raise SystemExit("no coder path completed")
        best = min(lat_results, key=lat_results.get)
        print(
            json.dumps(
                {
                    "metric": "bmshj2018_single_image_latency_p50",
                    "value": round(lat_results[best], 1),
                    "unit": "ms encode+decode (768x512, batch 1)",
                    "vs_baseline": 0.0,
                }
            )
        )
        return

    rounds = 3 if tiny else 6
    # Coder selection for the measured encode: "host" = native C++ range
    # coder fed by a symbols+rows fetch; "device" = on-TPU rANS
    # (codec/rans.py) shipping only compressed words — over a tunneled
    # chip the fetch is the dominant stage, so both product paths are
    # measured and the faster one is the headline. TPC_BENCH_CODER pins
    # one path for debugging. Decode auto-detects from the blob format.
    from compression_tpu.util.profiling import StageTimer

    forced = os.environ.get("TPC_BENCH_CODER")
    n_imgs = rounds * batch
    results = {}
    for coder in [forced] if forced else ["host", "device"]:
        try:
            # Warm this path's ENCODE and DECODE jits (the warmup above
            # used host; the device decoder is its own large scan program
            # whose first compile must not land in the timed region).
            warm_blobs = list(
                codec.compress_iter(iter([images]), depth=1, coder=coder)
            )
            list(codec.decompress_iter(iter(warm_blobs), depth=1))
            # Fresh timer for the measured region only.
            codec.timer = StageTimer()
            t0 = time.perf_counter()
            blob_stream = list(
                codec.compress_iter(
                    (images for _ in range(rounds)), depth=2, coder=coder
                )
            )
            t_enc = time.perf_counter()
            outs = list(codec.decompress_iter(iter(blob_stream), depth=2))
            dt = time.perf_counter() - t0
            t_dec = dt - (t_enc - t0)
            assert len(outs) == rounds and outs[0].shape == images.shape
            img_per_s = n_imgs / dt

            # Per-stage attribution (stderr; stdout stays one JSON line).
            # The pipelined wall time per phase should approach
            # max(stage sums), not their total — that gap is the measured
            # device/host overlap.
            print(f"--- coder={coder} ---", file=sys.stderr)
            print(codec.timer.report(), file=sys.stderr)
            tot = codec.timer.totals
            enc_s = sum(v for k, v in tot.items() if k.startswith("enc/"))
            dec_s = sum(v for k, v in tot.items() if k.startswith("dec/"))
            print(
                f"encode: wall {t_enc - t0:.3f}s vs stage-sum {enc_s:.3f}s "
                f"(overlap hidden {enc_s - (t_enc - t0):.3f}s); "
                f"decode: wall {t_dec:.3f}s vs stage-sum {dec_s:.3f}s "
                f"(overlap hidden {dec_s - t_dec:.3f}s); "
                f"{n_imgs} imgs, {img_per_s:.3f} img/s end-to-end",
                file=sys.stderr,
            )
            results[coder] = img_per_s
        except Exception as e:  # the driver must always get its JSON line
            print(f"coder {coder!r} failed: {e!r}", file=sys.stderr)
    if not results:
        raise SystemExit("no coder path completed")
    best = max(results, key=results.get)
    print(
        f"headline: coder={best} of {results}", file=sys.stderr
    )

    # Full-duplex transcode (VERDICT r4 task 4): chain the decode pipeline
    # directly onto the encode pipeline so batch i's image d2h fetch
    # overlaps batch i+2's input h2d upload. end_to_end above runs the two
    # phases back to back, each saturating the link in ONE direction at a
    # time; the serving deployment (compress requests and decompress
    # requests interleaved, or transcode) drives both directions at once.
    # Same bytes, same product code paths — only the phase barrier between
    # encode and decode is removed. Kept as a separate field so
    # `end_to_end`'s round-comparable semantics stay fixed.
    transcode = None
    try:
        codec.timer = StageTimer()
        t0 = time.perf_counter()
        outs = list(
            codec.decompress_iter(
                codec.compress_iter(
                    (images for _ in range(rounds)), depth=2, coder=best
                ),
                depth=2,
            )
        )
        dt = time.perf_counter() - t0
        assert len(outs) == rounds and outs[0].shape == images.shape
        transcode = n_imgs / dt
        print(
            f"transcode (chained enc->dec, full-duplex link): "
            f"{transcode:.3f} img/s vs end_to_end {results[best]:.3f}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"transcode metric failed: {e!r}", file=sys.stderr)

    # Round-comparability companions (VERDICT r3 item 3): link probe +
    # link-independent compute-only throughput. Best-effort — the
    # end-to-end product number must survive either failing.
    link_h2d = link_d2h = compute_only = mfu = None
    stages = {}
    try:
        link_h2d, link_d2h = link_probe()
        print(
            f"link probe: h2d {link_h2d:.1f} MB/s, d2h {link_d2h:.1f} MB/s",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"link probe failed: {e!r}", file=sys.stderr)
    try:
        compute_only, stages = compute_only_metric(codec, images, rounds)
        flops = bmshj2018_flops_per_image(cfg, h, w)
        import os as _os

        peak = float(_os.environ.get("TPC_PEAK_FLOPS", PEAK_FLOPS_BF16))
        mfu = compute_only * flops / peak
        stage_sum = sum(stages.values())
        print(
            f"compute-only (device-resident, link excluded): "
            f"{compute_only:.3f} img/s; transform FLOPs "
            f"{flops / 1e9:.1f} GFLOP/img -> MFU {100 * mfu:.2f}% of "
            f"bf16 peak {peak / 1e12:.0f} TF", file=sys.stderr,
        )
        print(
            "compute-only stage split (ms per batch of "
            f"{batch}): " + ", ".join(
                f"{k} {v:.1f}" for k, v in
                sorted(stages.items(), key=lambda kv: -kv[1])
            ) + f" | sum {stage_sum:.1f}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"compute-only metric failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bmshj2018_encode_decode_throughput",
                "value": round(results[best], 3),
                "unit": "img/s/chip (768x512)",
                # Documented single semantic: end_to_end / BENCH_r01's
                # 2.342 img/s on this same chip (see module docstring).
                "vs_baseline": round(results[best] / BASELINE_IMG_PER_S, 3),
                "end_to_end": round(results[best], 3),
                "coder": best,
                "transcode": round(transcode, 3) if transcode else None,
                "compute_only": (
                    round(compute_only, 3) if compute_only else None
                ),
                "mfu": round(mfu, 4) if mfu else None,
                "compute_stage_ms": (
                    {k: round(v, 1) for k, v in stages.items()}
                    if stages else None
                ),
                "link_h2d_MBps": (
                    round(link_h2d, 1) if link_h2d else None
                ),
                "link_d2h_MBps": (
                    round(link_d2h, 1) if link_d2h else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
