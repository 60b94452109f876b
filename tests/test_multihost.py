"""Multi-host (jax.distributed) execution: 2 real processes on CPU.

First-ever CI execution of `shard_local_channels`'s multi-process branch
(VERDICT r2 item 3): the launcher in tools/multihost_bench.py spawns 2
jax.distributed processes (Gloo collectives over the coordination
service), each owning a disjoint channel set, runs the RX chain over a
global channel-sharded mesh, and reports aggregate throughput + a
cross-host fleet-summary reduction.

The committed scaling artifact (MULTIHOST.json, >=90% target) is
measured with a larger workload; this test uses a tiny one and asserts
the machinery works and scaling is clearly super-50%, to stay robust on
noisy CI machines.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(n_procs: int, port: int) -> dict:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import multihost_bench as mh

    class A:
        procs = 2
        channels_per_host = 16
        blocks = 4
        repeats = 2
        devices_per_host = 2
        timing_reps = 2

    A.port = port
    return mh.launch(n_procs, A, port=port)


def test_two_process_distributed_run_and_scaling():
    r1 = _launch(1, port=12461)
    r2 = _launch(2, port=12463)

    # the multi-process branch really ran: 2 hosts x 16 local channels
    assert r2["num_processes"] == 2
    assert r2["channels_total"] == 32
    assert r1["channels_total"] == 16

    # the cross-host fleet summary (gloo all-reduce) produced a real
    # global mean over all 32 channels
    assert r2["fleet_summary_mean_energy"] > 0.0

    eff = r2["samples_per_sec"] / (2 * r1["samples_per_sec"])
    # committed artifact target is >=0.9 (MULTIHOST.json); in CI assert
    # the aggregate clearly scales rather than serializes
    assert eff > 0.55, (eff, r1, r2)
