"""Multi-host scaling measurement (VERDICT r2 item 3 / BASELINE.md).

Measures aggregate RX-chain throughput at 1 vs N jax.distributed
processes and reports the scaling efficiency against the BASELINE
target (>=90% linear at >=2 hosts).

Each process plays one "host": it owns a DISJOINT set of receiver
channels (t41x.mesh.distributed.shard_local_channels — the first real
execution of its multi-process branch), builds the global channel-
sharded array via jax.make_array_from_process_local_data, and runs the
bench step over a global mesh.  The steady state is communication-free
(channel parallelism is embarrassing); the only cross-host traffic is
the one scalar all-reduce that the global energy reduction lowers to
(t41x.mesh.distributed.fleet_summary's pattern), which doubles as the
cross-host synchronization point for timing.

On a single machine, "hosts" are simulated as processes pinned to
disjoint CPU sets (taskset), so each host has equal, non-overlapping
compute resources — the same per-host envelope at N=1 and N=2 — making
the aggregate samples/s comparison honest.  Collectives ride Gloo via
the jax.distributed coordination service, standing in for DCN.

Launcher (spawns itself once per process, runs N=1 then N=2..N):

    python tools/multihost_bench.py [--channels-per-host 64]
        [--blocks 8] [--procs 2] [--out MULTIHOST.json]

Single-process-as-rank mode (internal):

    python tools/multihost_bench.py --process-id I --num-processes N ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def rank_main(args) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=%d" % (
        args.devices_per_host)
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from t41x.mesh import distributed as dist

    dist.initialize(f"localhost:{args.port}", args.num_processes,
                    args.process_id)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from t41x import constants as C
    from t41x.chain import ChainSpec, RxChain, default_params

    mesh = dist.global_mesh(axis="ch")
    n_local = args.channels_per_host
    n_total = n_local * args.num_processes

    chain = RxChain(ChainSpec(mode="usb", spectrum_taps=True,
                              interpolate_out=True))
    rng = np.random.default_rng(100 + args.process_id)
    local_iq = (rng.standard_normal((n_local, args.blocks, C.BLOCK_SIZE))
                + 1j * rng.standard_normal((n_local, args.blocks,
                                            C.BLOCK_SIZE))
                ).astype(np.complex64) * 0.1
    iq_global = dist.shard_local_channels(mesh, local_iq)
    params = jax.device_put(
        default_params((n_total,)),
        NamedSharding(mesh, P("ch")))

    repeats = args.repeats

    @jax.jit
    def run(blocks, params):
        # per-CHANNEL energies (sharded, no cross-host reduce): the
        # steady state stays communication-free, like production —
        # cross-host traffic only in the fleet summary afterwards
        def step(st, blk):
            st, out = chain.block(params, st, blk)
            return st, jnp.sum(out["audio_24k"] ** 2, axis=-1)

        def rep(_, acc):
            st, e = acc
            st, ei = jax.lax.scan(step, st, jnp.moveaxis(blocks, 1, 0))
            return st, e + jnp.sum(ei, axis=0)

        st = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("ch"))),
            chain.init_state((n_total,)))
        _, e = jax.lax.fori_loop(0, repeats, rep,
                                 (st, jnp.zeros((n_total,), jnp.float32)))
        return e  # (C,) channel-sharded

    # warmup (compile + first execution), then a cross-host barrier so
    # every rank enters the timing loop together
    run(iq_global, params).block_until_ready()
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("t41x_mh_bench_start")
    times = []
    for _ in range(args.timing_reps):
        t0 = time.perf_counter()
        run(iq_global, params).block_until_ready()
        times.append(time.perf_counter() - t0)
    t = min(times)

    # the one piece of real cross-host traffic: a fleet-wide summary
    # reduction over the channel-sharded energies (gloo all-reduce)
    t0 = time.perf_counter()
    summary = dist.fleet_summary(run(iq_global, params))
    mean_e = float(summary["mean"])
    fleet_s = time.perf_counter() - t0 - t
    samples = n_total * args.blocks * repeats * C.BLOCK_SIZE
    result = {
        "num_processes": args.num_processes,
        "process_id": args.process_id,
        "channels_total": n_total,
        "blocks": args.blocks,
        "repeats": repeats,
        "wall_s": t,
        "samples_per_sec": samples / t,
        "fleet_summary_mean_energy": mean_e,
        "fleet_summary_overhead_s": max(fleet_s, 0.0),
    }
    if args.process_id == 0:
        print("RESULT " + json.dumps(result), flush=True)


def cpu_sets(n_procs: int, max_procs: int) -> list[str]:
    """CPU sets for each simulated host, sized for `max_procs` hosts so
    EVERY run (N=1..max) gives each host the same per-host compute
    envelope — otherwise the N=1 baseline would get the whole machine
    and the comparison would be meaningless.  When n_procs exceeds the
    physical CPU count the assignment wraps around (OVERSUBSCRIBED —
    two 'hosts' share a core): the run then measures the machine's
    capacity ceiling rather than linear scaling, reported as
    `efficiency_vs_capacity`."""
    n_cpu = os.cpu_count() or 1
    per = max(1, n_cpu // max_procs)
    sets = []
    for i in range(n_procs):
        cpus = sorted({(i * per + j) % n_cpu for j in range(per)})
        sets.append(",".join(str(c) for c in cpus))
    return sets


def launch(n_procs: int, args, port: int) -> dict:
    sets = cpu_sets(n_procs, args.procs)
    procs = []
    for i in range(n_procs):
        cmd = ["taskset", "-c", sets[i], sys.executable,
               os.path.abspath(__file__),
               "--process-id", str(i), "--num-processes", str(n_procs),
               "--port", str(port),
               "--channels-per-host", str(args.channels_per_host),
               "--blocks", str(args.blocks),
               "--repeats", str(args.repeats),
               "--devices-per-host", str(args.devices_per_host),
               "--timing-reps", str(args.timing_reps)]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL,
            text=True))
    out, _ = procs[0].communicate(timeout=900)
    for p in procs[1:]:
        p.wait(timeout=900)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line from rank 0:\n{out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--port", type=int, default=12421)
    ap.add_argument("--channels-per-host", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--timing-reps", type=int, default=3)
    ap.add_argument("--procs", type=int, default=2,
                    help="max simulated hosts (launcher mode)")
    ap.add_argument("--out", default=None,
                    help="write the scaling artifact to this JSON file")
    args = ap.parse_args()

    if args.process_id is not None:
        rank_main(args)
        return

    results = []
    for n in range(1, args.procs + 1):
        r = launch(n, args, port=args.port + n)
        rate = r["samples_per_sec"]
        results.append(r)
        print(f"hosts={n}: {rate/1e6:.1f} Msamples/s aggregate "
              f"({r['channels_total']} channels)", flush=True)
    base = results[0]["samples_per_sec"]
    n_cpu = os.cpu_count() or 1
    per = max(1, n_cpu // args.procs)
    capacity_hosts = max(1, n_cpu // per)   # hosts that fit w/o sharing
    for r in results[1:]:
        n = r["num_processes"]
        r["scaling_efficiency"] = r["samples_per_sec"] / (n * base)
        r["oversubscribed"] = n > capacity_hosts
        # vs what the physical cores can deliver: an oversubscribed run
        # can at best hold the capacity_hosts aggregate
        r["efficiency_vs_capacity"] = (
            r["samples_per_sec"] / (min(n, capacity_hosts) * base))
        tag = (" [oversubscribed: "
               f"{n} hosts on {n_cpu} cores, "
               f"{r['efficiency_vs_capacity']*100:.1f}% of capacity]"
               if r["oversubscribed"] else "")
        print(f"scaling efficiency at {n} hosts: "
              f"{r['scaling_efficiency']*100:.1f}% (target >= 90%){tag}")
    artifact = {"cpu_count": os.cpu_count(),
                "devices_per_host": args.devices_per_host,
                "runs": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
