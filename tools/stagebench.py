"""Per-stage / per-variant timing of the RX chain on the live device.

Times several ChainSpec variants (full chain, AGC off, NR on, FFT vs
matmul OS filter, ...) at a fixed channel count with the same
compute-bound methodology as bench.py (in-graph fori_loop repeats,
device-resident inputs, result fetch), and prints per-block µs per
variant so the cost of each stage is the delta between variants.

Usage: python tools/stagebench.py [--channels 1024] [--min-ms 150]
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=1024)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--min-ms", type=float, default=150.0)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from t41x import constants as C
    from t41x.chain import ChainSpec, RxChain, default_params
    from t41x.utils import creal

    variants = {
        "full": dict(),
        "agc_off": dict(agc_mode=0),
        "fft_osfilter": dict(use_matmul_osfilter=False),
        "no_spectrum_taps": dict(spectrum_taps=False),
        "no_interp": dict(interpolate_out=False),
        "front_end_only": dict(mode="psk31", interpolate_out=False),
        "nr_spectral": dict(nr_mode=2),
        "nr_lms": dict(nr_mode=3),
        "sam": dict(mode="sam"),
        "nfm": dict(mode="nfm"),
        "pallas": dict(use_pallas=True),
        "pallas_nospec": dict(use_pallas=True, spectrum_taps=False),
        "pallas_agc_off": dict(use_pallas=True, agc_mode=0),
        "pallas_no_interp": dict(use_pallas=True, interpolate_out=False),
        "pallas_fe_only": dict(use_pallas=True, mode="psk31", interpolate_out=False),
        "pallas_nr_lms": dict(use_pallas=True, nr_mode=3),
        "pallas_sam": dict(use_pallas=True, mode="sam"),
        "pallas_nfm": dict(use_pallas=True, mode="nfm"),
        "pallas_nr_spectral": dict(use_pallas=True, nr_mode=2),
        "pallas_nr_kim": dict(use_pallas=True, nr_mode=1),
        "pallas_notch": dict(use_pallas=True, notch_on=True),
        "pallas_eq": dict(use_pallas=True, eq_on=True),
        "pallas_cw": dict(use_pallas=True, mode="cw"),
        "pallas_q15": dict(use_pallas=True, q15_input=True),
        "pallas_q15_fe_only": dict(use_pallas=True, q15_input=True,
                                   mode="psk31", interpolate_out=False),
        "zoom2": dict(spectrum_zoom=1),
        # cross-block NR batching (chain.block_batch): the scan's NR
        # stage lifts out and runs once per 8-block batch
        "pallas_nr_kim_batch": dict(use_pallas=True, nr_mode=1,
                                    _batched=True),
        "pallas_nr_spectral_batch": dict(use_pallas=True, nr_mode=2,
                                         _batched=True),
        "pallas_zoom1": dict(use_pallas=True, spectrum_zoom=0),
        "pallas_zoom2": dict(use_pallas=True, spectrum_zoom=1),
        "pallas_zoom8": dict(use_pallas=True, spectrum_zoom=3),
        "pallas_zoom128": dict(use_pallas=True, spectrum_zoom=7),
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    n_ch = args.channels
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal((args.blocks, n_ch, C.BLOCK_SIZE))
          + 1j * rng.standard_normal((args.blocks, n_ch, C.BLOCK_SIZE))
          ).astype(np.complex64) * 0.1

    def floor() -> float:
        f = jax.jit(lambda v: v + 1.0)
        v = jnp.zeros((), jnp.float32)
        float(f(v))
        return min(_t_one(lambda: float(f(v))) for _ in range(8))

    def _t_one(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    floor_s = floor()
    print(f"# dispatch floor {floor_s*1e3:.1f} ms", file=sys.stderr)

    base_us = None
    for name, kw in variants.items():
        kw = dict(kw)
        batched = kw.pop("_batched", False)
        spec = ChainSpec(**{**dict(interpolate_out=True), **kw})
        chain = RxChain(spec)
        params = jax.tree.map(np.asarray, default_params((n_ch,)))

        def mk(repeats):
            def chk(out):
                # checksum EVERY output so XLA cannot DCE any tap from
                # the timed region (summing audio alone silently
                # dropped the zoom/display/S-meter/interp outputs —
                # ~60 us/block of real production work; r5 finding,
                # reconciling the old bench-vs-stagebench delta)
                e = jnp.sum(out["audio_24k"] ** 2)
                for v in out.values():
                    if jnp.iscomplexobj(v):
                        v = v.real
                    e = e + jnp.sum(v.astype(jnp.float32)) \
                        * jnp.float32(1e-6)
                return e

            def body(blocks, st, params):
                def step(st, blk):
                    st, out = chain.block(params, st, blk)
                    return st, chk(out)

                def rep(_, acc):
                    st, e = acc
                    if batched:
                        st, outs = chain.block_batch(params, st, blocks)
                        return st, e + chk(outs)
                    st, ei = jax.lax.scan(step, st, blocks)
                    return st, e + jnp.sum(ei)

                st, e = jax.lax.fori_loop(0, repeats, rep,
                                          (st, jnp.float32(0.0)))
                return e

            run = creal.cjit(body)
            if spec.q15_input:
                blocks = (
                    np.clip(np.round(iq.real * 32768.0), -32768,
                            32767).astype(np.int16),
                    np.clip(np.round(iq.imag * 32768.0), -32768,
                            32767).astype(np.int16))
            else:
                blocks = creal.csplit(iq)
            st = creal.csplit(chain.init_state((n_ch,)))
            blocks, st, p = jax.device_put((blocks, st, params))
            jax.block_until_ready((blocks, st, p))
            return run, blocks, st, p

        try:
            run, blocks, st, p = mk(1)
            float(run(blocks, st, p))
            t1 = min(_t_one(lambda: float(run(blocks, st, p)))
                     for _ in range(2))
            per = max(t1 - floor_s, t1 / 10, 1e-5)
            repeats = max(1, int(np.ceil(args.min_ms / 1e3 / per)))
            if repeats > 1:
                run, blocks, st, p = mk(repeats)
                float(run(blocks, st, p))
            t = min(_t_one(lambda: float(run(blocks, st, p)))
                    for _ in range(3))
            n_blk = repeats * args.blocks
            us_blk = (t - floor_s) / n_blk * 1e6
            rate = n_blk * n_ch * C.BLOCK_SIZE / (t - floor_s)
            delta = "" if base_us is None else f"  (vs base {us_blk-base_us:+.0f} us)"
            if base_us is None:
                base_us = us_blk
            print(f"{name:28s} {us_blk:8.1f} us/block/{n_ch}ch  "
                  f"{rate/1e9:7.2f} Gs/s{delta}")
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
