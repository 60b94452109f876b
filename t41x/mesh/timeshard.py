"""Time-sharded front-end execution (JAX).

Completes the sequence-parallel story (SURVEY.md §7 phase 6): the RX
chain's LTI front end — Fs/4 shift, NCO mix, x4+x2 decimation,
overlap-save band-pass — is time-shardable because every carried state
is a finite filter history, exchanged via one `ppermute` per stage over
ICI (t41x.mesh.halo).  The nonlinear tail (AGC, PLLs, NR trackers) has
an unbounded per-sample dependency and stays sequential per shard; for
offline captures it runs as a fast second pass over the (already small)
audio-rate output, or with AGC off the front end IS the whole chain.

`sharded_frontend(chain)` returns a function suitable for `shard_map`
over a mesh `t` axis: seg -> filtered baseband for that time segment,
sample-exact with the streamed unsharded chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from t41x import constants as C
from t41x.mesh import halo


def sharded_frontend(chain, axis_name: str = "t", nco_freq: float = 0.0):
    """Per-shard function: (iq_seg, seg_index, n_shards) are implied by
    the mesh; iq_seg (..., N_seg) with N_seg divisible by BLOCK."""
    h1 = jnp.asarray(chain.h1)
    h2 = jnp.asarray(chain.h2)
    mask = jnp.asarray(chain.mask)

    def fn(seg):
        from t41x.dsp import nco

        n = seg.shape[-1]
        # global sample offset of this shard for phase-coherent shifts
        idx = jax.lax.axis_index(axis_name)
        offset = idx * n
        # Fs/4 shift with global phase: j^(offset+n) pattern
        k = jnp.arange(n) + offset
        pattern = jnp.exp(0.5j * jnp.pi * (k % 4)).astype(jnp.complex64)
        x = seg * pattern
        # NCO with global phase
        w = nco.nco_phase_inc(jnp.float32(nco_freq), chain.spec.sample_rate)
        theta = w * (k + 1).astype(jnp.float32)
        x = (nco.FREQ_ADJ_FACTOR * x) * jnp.exp(-1j * theta).astype(
            jnp.complex64)
        x = halo.sharded_fir_decimate(x, h1, C.DF1, axis_name)
        x = halo.sharded_fir_decimate(x, h2, C.DF2, axis_name)
        x = x * chain.vol_scale
        return halo.sharded_os_filter(x, mask, axis_name,
                                      chain.spec.fft_length)

    return fn


def run_time_sharded(chain, mesh: Mesh, iq, axis_name: str = "t",
                     nco_freq: float = 0.0):
    """Convenience: run the front end over a capture time-sharded on
    `mesh`.  iq: (N,) complex with N divisible by (n_devices * BLOCK)."""
    fn = sharded_frontend(chain, axis_name, nco_freq)
    sharded = jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=P(axis_name), out_specs=P(axis_name)))
    return sharded(iq)
