"""FT8 slot scheduler, checkpoint/resume, and debug tracing tests."""

import numpy as np

from t41x import constants as C
from t41x.chain import ChainSpec, RxChain
from t41x.config import RadioConfig
from t41x.decode.ft8 import encode
from t41x.decode.ft8.slots import SlotManager
from t41x.io import signals
from t41x.utils import checkpoint, debugtrace


def test_slot_manager_aligns_and_decodes():
    msg = "CQ K1ABC FN42"
    rate = C.AUDIO_RATE
    sig = encode.synth_audio(encode.encode(msg), base_freq=1000.0)
    # stream starts 7 s before a slot boundary; signal begins 0.4 s
    # after the boundary
    pre = np.zeros(int(8.0 * rate), np.float32)  # covers sync wait
    slot_audio = np.zeros(int(15 * rate), np.float32)
    slot_audio[int(0.4 * rate): int(0.4 * rate) + len(sig)] = sig

    decoded_msgs = []

    def decode_fn(a):
        from t41x.decode.ft8 import decode as d
        r = d.decode_audio(a)
        decoded_msgs.extend(x.text for x in r)
        return r

    # clock: stream begins at t=8 s within a slot (7 s to boundary)
    t0 = 8.0
    sm = SlotManager(decode_fn, clock=lambda: t0 + sm.samples_fed / rate)
    stream = np.concatenate([pre[: int(7.0 * rate)], slot_audio,
                             np.zeros(int(1.0 * rate), np.float32)])
    blk = 4096
    for i in range(len(stream) // blk):
        sm.feed(stream[i * blk: (i + 1) * blk])
    assert sm.slots_decoded == 1
    assert msg in decoded_msgs, decoded_msgs


def test_checkpoint_resume_bit_exact(tmp_path):
    chain = RxChain(ChainSpec(mode="usb", interpolate_out=False))
    iq = signals.usb_signal([900.0], 8 * C.BLOCK_SIZE) * 0.25
    from t41x.chain import default_params
    import jax.numpy as jnp

    params = default_params(())
    st = chain.init_state(())
    for b in range(4):
        st, _ = chain.block(params, st,
                            jnp.asarray(iq[b * C.BLOCK_SIZE:
                                           (b + 1) * C.BLOCK_SIZE]))
    p = str(tmp_path / "state.npz")
    checkpoint.save_state(p, st, extra={"block": 4})
    st2, meta = checkpoint.load_state(p, chain.init_state(()))
    assert meta["block"] == 4
    # continue from checkpoint vs continue in memory: identical audio
    outs_a, outs_b = [], []
    sa, sb = st, st2
    for b in range(4, 8):
        blk = jnp.asarray(iq[b * C.BLOCK_SIZE: (b + 1) * C.BLOCK_SIZE])
        sa, oa = chain.block(params, sa, blk)
        sb, ob = chain.block(params, sb, blk)
        outs_a.append(np.asarray(oa["audio_24k"]))
        outs_b.append(np.asarray(ob["audio_24k"]))
    np.testing.assert_array_equal(np.concatenate(outs_a),
                                  np.concatenate(outs_b))


def test_config_tracer_diffs():
    cfg = RadioConfig()
    tr = debugtrace.ConfigTracer()
    tr.enter(cfg)
    cfg.audio_volume = 77
    cfg.bands[2].f_hi_cut = 2500
    diff = tr.exit(cfg)
    assert diff["audio_volume"] == (50, 77)
    assert any("f_hi_cut" in k for k in diff)
    # no-change pass is empty
    tr.enter(cfg)
    assert tr.exit(cfg) == {}


def test_stage_timer():
    import time

    t = debugtrace.StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    r = t.report()
    assert r["a"]["count"] == 2
    assert 5 < r["a"]["mean_ms"] < 100


def test_checkpoint_forward_compat_missing_field(tmp_path):
    """A checkpoint written before a state field existed loads with the
    template's init value for that field (e.g. KimState.idx added in r3)."""
    import numpy as np

    from t41x.dsp import nr as nr_mod

    st = nr_mod.kim_state((2,))
    path = str(tmp_path / "old.npz")
    checkpoint.save_state(path, st, extra={"v": 1})
    # simulate an older format: drop the idx leaf from the archive
    z = dict(np.load(path))
    z.pop("s:nr/idx", None)
    removed = [k for k in list(z) if k.endswith("/idx") or k == "s:idx"]
    for k in removed:
        z.pop(k)
    np.savez_compressed(path, **z)

    loaded, meta = checkpoint.load_state(path, st)
    assert meta == {"v": 1}
    np.testing.assert_array_equal(np.asarray(loaded.idx),
                                  np.asarray(st.idx))
    np.testing.assert_array_equal(np.asarray(loaded.E), np.asarray(st.E))
