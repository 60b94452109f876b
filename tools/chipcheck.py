"""On-chip value parity of every Pallas kernel (VERDICT r4 item 1b).

Each row streams a full-chain configuration that engages ONE Pallas
kernel (fused front end, q15 ingest, zoom taps, fused AGC, OS-filter
matmul kernel, Kim/spectral NR gain kernels, LMS/Xanr, SAM PLL, EQ
operator, CW detector) on the CURRENT jax backend twice — use_pallas on
vs off — and reports the audio parity in dB plus the displayed-spectrum
error where the config has a display tap.  On the real TPU this is the
Mosaic-vs-XLA check the CPU interpreter tests cannot provide (the r5
DC-leak and bf16-precision bugs were both invisible on CPU); run it
after any kernel change.

Usage: python tools/chipcheck.py [--channels 128] [--blocks 6]
       [--json CHIPCHECK.json]
Writes one table row per kernel config; every row must pass the same
bounds bench.py --check enforces (>=55 dB audio, <=0.5 dB spectrum).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from t41x import constants as C                            # noqa: E402
from t41x.chain import ChainSpec, RxChain, default_params  # noqa: E402
from t41x.utils import creal                               # noqa: E402

# one row per Pallas kernel / kernel path.  metric "waveform" = audio
# SNR >= 55 dB; "spectral" = displayed-power-spectrum agreement for
# ADAPTIVE stages (LMS weight adaptation and the SAM PLL feed fp
# rounding back into their own state, so waveform trajectories diverge
# chaotically between ANY two arithmetic orders — the reference's LMS
# on different silicon rounds differently too; what must match is the
# steady-state filtering BEHAVIOR)
CONFIGS = [
    ("frontend", dict(mode="usb"), "waveform"),
    ("frontend_q15", dict(mode="usb", q15_input=True), "waveform"),
    ("zoom_x1_tap", dict(mode="usb", spectrum_zoom=0), "waveform"),
    ("zoom_x32_tap", dict(mode="usb", spectrum_zoom=5), "waveform"),
    ("os_filter_kernel", dict(mode="usb", spectrum_taps=False),
     "waveform"),
    ("agc_kernel", dict(mode="usb", agc_mode=4), "waveform"),
    ("nr_kim", dict(mode="usb", nr_mode=1), "waveform"),
    ("nr_spectral", dict(mode="usb", nr_mode=2), "waveform"),
    ("nr_lms", dict(mode="usb", nr_mode=3), "spectral"),
    ("autonotch", dict(mode="usb", notch_on=True), "spectral"),
    ("sam_pll", dict(mode="sam", f_lo=-3000.0, f_hi=3000.0),
     "spectral"),
    ("eq_operator", dict(mode="usb", eq_on=True), "waveform"),
    ("cw_detect", dict(mode="cw", cw_filter_index=1), "waveform"),
]


def _iq(n_ch: int, n_blocks: int, mode: str):
    rng = np.random.default_rng(7)
    t = np.arange(n_blocks * C.BLOCK_SIZE) / C.SAMPLE_RATE
    if mode == "sam":
        # AM carrier near baseband so the PLL locks (cf.
        # tests/test_frontend_fused.py::test_fused_sam_tail_post_lock)
        env = 1.0 + 0.3 * np.cos(2 * np.pi * 400.0 * t)
        sig = 0.4 * env * np.exp(
            2j * np.pi * (-C.SAMPLE_RATE / 4 + 30.0) * t)
        noise = 0.01
    else:
        sig = 0.3 * np.exp(2j * np.pi * (C.SAMPLE_RATE / 4 + 1500.0) * t)
        noise = 0.05
    return (sig + (rng.standard_normal((n_ch, t.size))
                   + 1j * rng.standard_normal((n_ch, t.size))) * noise
            ).astype(np.complex64)


def _stream(spec: ChainSpec, iq: np.ndarray, n_blocks: int):
    n_ch = iq.shape[0]
    chain = RxChain(spec)
    params = jax.tree.map(np.asarray, default_params((n_ch,)))

    def run(blocks, st, params):
        def body(st, blk):
            st, out = chain.block(params, st, blk)
            keep = {k: out[k] for k in ("audio", "audio_24k",
                                        "rf_spectrum") if k in out}
            return st, keep

        return jax.lax.scan(body, st, blocks)

    if spec.q15_input:
        data = (np.clip(np.round(iq.real * 32768.0), -32768,
                        32767).astype(np.int16),
                np.clip(np.round(iq.imag * 32768.0), -32768,
                        32767).astype(np.int16))
    else:
        data = creal.csplit(iq)
    blocks = jax.tree.map(
        lambda a: np.stack(np.split(a, n_blocks, axis=-1)), data)
    st = creal.csplit(chain.init_state((n_ch,)))
    _, outs = creal.cjit(run)(*jax.device_put((blocks, st, params)))
    return {k: np.asarray(v) for k, v in outs.items()}


def check_one(name: str, kw: dict, n_ch: int, n_blocks: int,
              metric: str = "waveform") -> dict:
    if metric == "spectral":
        # adaptive stages need their convergence transient excluded:
        # the SAM PLL's lock trajectory is chaotic (measured: carrier
        # estimates agree to <1 mHz and PSD to 0.2 dB by block 10, but
        # differ wildly during blocks 0-4)
        n_blocks = max(n_blocks, 12)
    iq = _iq(n_ch, n_blocks, kw.get("mode", "usb"))
    base = dict(interpolate_out=True, use_matmul_osfilter=True)
    base.update(kw)
    fused = _stream(ChainSpec(use_pallas=True, **base), iq, n_blocks)
    plain = _stream(ChainSpec(use_pallas=False, **base), iq, n_blocks)
    row = {"config": name, "ok": True}
    for k, r in plain.items():
        g = fused[k].astype(np.float64)
        r = r.astype(np.float64)
        if k == "rf_spectrum":
            fl = max(r.max(), g.max()) * 1e-6
            d = float(np.max(np.abs(
                10 * np.log10(np.maximum(g, fl))
                - 10 * np.log10(np.maximum(r, fl)))))
            row["spectrum_max_err_db"] = round(d, 3)
            row["ok"] = bool(row["ok"] and d < 0.5)
            continue
        if metric == "spectral":
            # steady-state audio power spectrum, last 2 blocks, bins
            # within 40 dB of the peak, 3 dB display-grade bound
            def psd(a):
                a = np.moveaxis(a[-2:], 0, 1).reshape(n_ch, -1)
                w = np.hanning(a.shape[-1])
                return 10 * np.log10(
                    np.abs(np.fft.rfft(a * w)) ** 2 + 1e-12)

            pr, pg = psd(r), psd(g)
            mask = pr > pr.max() - 40.0
            d = float(np.max(np.abs(pg[mask] - pr[mask])))
            row[k + "_psd_err_db"] = round(d, 2)
            row["ok"] = bool(row["ok"] and d < 3.0)
            continue
        err = np.mean(np.abs(r - g) ** 2)
        sig = np.mean(np.abs(r) ** 2)
        db = float("inf") if err == 0.0 else 10.0 * np.log10(sig / err)
        row[k + "_db"] = round(db, 1) if np.isfinite(db) else db
        row["ok"] = bool(row["ok"] and db > 55.0)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated config names")
    args = ap.parse_args()

    dev = jax.devices()[0]
    rows = []
    names = args.only.split(",") if args.only else None
    for name, kw, metric in CONFIGS:
        if names and name not in names:
            continue
        try:
            row = check_one(name, kw, args.channels, args.blocks,
                            metric)
        except Exception as e:
            row = {"config": name, "ok": False, "error": repr(e)[:200]}
        rows.append(row)
        extras = {k: v for k, v in row.items() if k not in ("config", "ok")}
        print(f"{name:18s} {'PASS' if row.get('ok') else 'FAIL'}  "
              + "  ".join(f"{k}={v}" for k, v in extras.items()),
              flush=True)

    result = {"device": str(dev.device_kind), "platform": dev.platform,
              "channels": args.channels, "blocks": args.blocks,
              "all_ok": all(r.get("ok") for r in rows), "rows": rows}
    print(f"ALL {'PASS' if result['all_ok'] else 'FAIL'} on "
          f"{result['device']}")
    if args.json:
        Path(args.json).write_text(json.dumps(result, indent=1))
        print(f"wrote {args.json}")
    sys.exit(0 if result["all_ok"] else 1)


if __name__ == "__main__":
    main()
