"""t41x headline benchmark — complex input samples/sec/chip through the
full decimate + overlap-save filter + AGC + demod chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the reference radio's real-time envelope:
one receiver at 192_000 complex samples/s on its MCU (BASELINE.md), i.e.
vs_baseline == number of simultaneous real-time 192 kHz channels this
chip sustains.

Runs on whatever JAX platform the environment provides (the driver runs
it on a real TPU chip).  Usage: python bench.py [--channels N]
[--blocks N] [--mode usb].
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=0,
                    help="0 = auto-search for best throughput")
    ap.add_argument("--blocks", type=int, default=8,
                    help="blocks per timed step (scan length)")
    ap.add_argument("--mode", default="usb")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpolate", action="store_true", default=False)
    ap.add_argument("--pallas", action="store_true", default=False,
                    help="use the Pallas fused overlap-save kernel")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--config", default="rx",
                    choices=["rx", "cw", "nfm", "nr", "beacon",
                             "channelizer"],
                    help="BASELINE benchmark configuration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from t41x import constants as C
    from t41x.chain import ChainSpec, RxChain, default_params

    cfg_map = {
        "rx": dict(mode=args.mode),
        "cw": dict(mode="cw", spectrum_zoom=2, cw_filter_index=1,
                   nr_mode=2),
        "nfm": dict(mode="nfm"),
        "nr": dict(mode=args.mode, nr_mode=2),
        "beacon": dict(mode="usb", spectrum_zoom=1),
        "channelizer": dict(mode="usb"),
    }
    spec = ChainSpec(spectrum_taps=False, use_matmul_osfilter=True,
                     use_pallas=args.pallas,
                     interpolate_out=args.interpolate,
                     **cfg_map[args.config])
    chain = RxChain(spec)
    channelize = args.config == "channelizer"
    cz = None
    if channelize:
        from t41x.mesh.channelizer import Channelizer
        cz = Channelizer(16)

    def build(n_ch: int, n_blocks: int):
        # params passed as jit arguments, not closure constants: the axon
        # remote backend cannot device->host copy captured device arrays
        # at lowering time
        params = jax.tree.map(np.asarray, default_params((n_ch,)))

        @jax.jit
        def run(blocks, st, params):
            def step(carry, blk):
                st, cz_st = carry
                if cz is not None:
                    # wideband front end: blk (n_ch/16, 16*BLOCK) wide
                    cz_st, chans = cz.block(cz_st, blk)
                    blk = chans.reshape(-1, blk.shape[-1] // 16)
                st, out = chain.block(params, st, blk)
                return (st, cz_st), jnp.sum(out["audio_24k"] ** 2)

            (st, _), e = jax.lax.scan(
                step, (st, cz.init_state((n_ch // 16,)) if cz else ()),
                blocks)
            return st, jnp.sum(e)

        rng = np.random.default_rng(0)
        shape = ((n_blocks, n_ch // 16, 16 * C.BLOCK_SIZE) if cz
                 else (n_blocks, n_ch, C.BLOCK_SIZE))
        blocks = jnp.asarray(
            (rng.standard_normal(shape)
             + 1j * rng.standard_normal(shape)
             ).astype(np.complex64) * 0.1)
        st = chain.init_state((n_ch,))
        return run, blocks, st, params

    def measure(n_ch: int) -> float:
        run, blocks, st, params = build(n_ch, args.blocks)
        st, e = run(blocks, st, params)  # compile + warm
        jax.block_until_ready(e)
        if args.profile:
            with jax.profiler.trace(args.profile):
                st, e = run(blocks, st, params)
                jax.block_until_ready(e)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, e = run(blocks, st, params)
            jax.block_until_ready(e)
            best = min(best, time.perf_counter() - t0)
        samples = args.blocks * n_ch * C.BLOCK_SIZE
        return samples / best

    if args.channels:
        candidates = [args.channels]
    else:
        # two sizes bound worst-case remote-compile time
        candidates = [1024, 4096]

    best_rate, best_ch = 0.0, 0
    for n_ch in candidates:
        try:
            rate = measure(n_ch)
        except Exception as e:  # OOM etc.
            print(f"# channels={n_ch} failed: {e}", file=sys.stderr)
            continue
        print(f"# channels={n_ch}: {rate/1e6:.1f} Msamples/s "
              f"({rate/192000:.0f} real-time channels)", file=sys.stderr)
        if rate > best_rate:
            best_rate, best_ch = rate, n_ch

    print(json.dumps({
        "metric": f"iq_samples_per_sec_per_chip_full_{args.config}_chain",
        "value": round(best_rate, 1),
        "unit": "complex samples/s",
        "vs_baseline": round(best_rate / 192000.0, 2),
        "config": {"mode": spec.mode, "bench": args.config,
                   "pallas": args.pallas, "channels": best_ch,
                   "blocks": args.blocks,
                   "platform": jax.devices()[0].platform,
                   "device": str(jax.devices()[0].device_kind)},
    }))


if __name__ == "__main__":
    main()
