"""AGC oracle parity: the channel-batched branchless scan vs a literal
scalar transcription of the reference state machine (tmr4/T41_SDR
`DSP_Fn.cpp:479-632`), sample by sample."""

import jax.numpy as jnp
import numpy as np

from t41x.dsp import agc


def scalar_agc_oracle(p: agc.AGCParams, x: np.ndarray) -> np.ndarray:
    """Direct transcription of the reference's per-sample loop using a
    shift-register delay line (equivalent to its ring indexing)."""
    B = p.attack_buffsize
    ring = np.zeros(B, np.complex64)
    abs_ring = np.zeros(B, np.float32)
    volts = save_volts = fast_back = hang_back = 0.0
    hang_counter = 0
    decay_type = 0
    state = 0
    out = np.empty_like(x)

    for i, xn in enumerate(x):
        out_sample = ring[0]
        abs_out = abs_ring[0]
        ring = np.concatenate([ring[1:], [xn]])
        abs_ring = np.concatenate([abs_ring[1:], [abs(xn)]])
        ring_max = float(abs_ring.max())

        fast_back = p.fast_backmult * abs_out + p.onemfast_backmult * fast_back
        hang_back = p.hang_backmult * abs_out + p.onemhang_backmult * hang_back
        if hang_counter > 0:
            hang_counter -= 1

        if ring_max >= volts:
            if state >= 2:
                save_volts = volts
            state = 0
            volts += (ring_max - volts) * p.attack_mult
        else:
            if state == 0:
                if volts > p.pop_ratio * fast_back:
                    state = 1
                    volts += (ring_max - volts) * p.fast_decay_mult
                elif p.hang_enable and hang_back > p.hang_level:
                    state = 2
                    hang_counter = p.hang_counter_init
                    decay_type = 1
                else:
                    state = 3
                    volts += (ring_max - volts) * p.decay_mult
                    decay_type = 0
            elif state == 1:
                if volts > save_volts:
                    volts += (ring_max - volts) * p.fast_decay_mult
                elif hang_counter > 0:
                    state = 2
                elif decay_type == 0:
                    state = 3
                    volts += (ring_max - volts) * p.decay_mult
                else:
                    state = 4
                    volts += (ring_max - volts) * p.hang_decay_mult
            elif state == 2:
                if hang_counter == 0:
                    state = 4
                    volts += (ring_max - volts) * p.hang_decay_mult
            elif state == 3:
                volts += (ring_max - volts) * p.decay_mult * 0.05
            else:
                volts += (ring_max - volts) * p.hang_decay_mult

        volts = max(volts, p.min_volts)
        mult = (p.out_target - p.slope_constant
                * min(0.0, np.log10(p.inv_max_input * volts))) / volts
        out[i] = out_sample * mult
    return out


def test_agc_matches_scalar_oracle():
    for mode in (1, 2, 3, 4):
        p = agc.agc_params(mode=mode)
        rng = np.random.default_rng(mode)
        n = 3000
        # bursty signal exercising attack, hang, and decay paths
        env = (np.sin(2 * np.pi * 3.0 * np.arange(n) / 24000) > 0)
        x = (0.4 * env * rng.standard_normal(n)
             + 0.005 * rng.standard_normal(n)).astype(np.complex64)
        st = agc.agc_state(p)
        _, got = agc.agc_apply(p, st, jnp.asarray(x))
        want = scalar_agc_oracle(p, x)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-5, err_msg=f"mode {mode}")
