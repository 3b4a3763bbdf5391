"""Run the full benchmark grid and commit the results table.

The reference commits sweep configs (benchmarks/configs/*.yaml,
hopper/benchmark_mla_decode.py); this runs every benchmark script on the
attached TPU and writes benchmarks/RESULTS.md + RESULTS.jsonl so each
round's numbers are diffable and regressions are visible.

    python benchmarks/run_grid.py [--quick]
"""

import argparse
import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

SCRIPTS = [
    "benchmark_flash_attention.py",
    "benchmark_decode.py",
    "benchmark_sparse.py",
    "benchmark_varlen.py",
    "benchmark_blocksparse.py",
    "benchmark_quant.py",
    "quant_kv_accuracy.py",
    "benchmark_serving.py",
    "benchmark_train_mfu.py",
]


def _multihost_scaling():
    """Data-parallel serving scaling across 2 REAL OS processes — a
    CPU-proxy (virtual devices, no DCN hardware) for the >=85%%-at-2-hosts
    north star. Reuses the tests/multihost_worker.py harness: engine per
    process, barrier-synchronized parallel pass, aggregate tokens/s vs
    nproc * solo tokens/s."""
    import re
    import socket

    repo = os.path.dirname(HERE)
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # Compute-bound proxy configuration (per-host batch sized to hide the
    # grad psum — the >=85%-at-2-hosts recipe).
    env["FLASH_ATTN_TPU_PROXY_HEAVY"] = "1"
    print("== multihost scaling (2-process CPU proxy) ==", flush=True)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=540)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        return [{"bench": "multihost_scaling_cpu_proxy", "error": "timeout"}]
    m = p = None
    for out in outs:
        m = m or re.search(
            r"ENGINE_DP_OK tokens=(\d+) agg_tps=([\d.]+) "
            r"scaling_eff=([\d.]+)", out
        )
        p = p or re.search(
            r"SCALING_PROXY_OK t_local=([\d.]+) t_global=([\d.]+) "
            r"overhead_eff=([\d.]+)", out
        )
    if m is None:
        return [{"bench": "multihost_scaling_cpu_proxy",
                 "error": outs[0][-500:]}]
    cpus = os.cpu_count() or 1
    note = "virtual CPU devices, no DCN — proxy only"
    if cpus < 2:
        # Both processes time-share one core, so eff ~ 1/nproc by
        # construction; the number then validates correctness + overhead
        # accounting, not scaling.
        note += f"; host has {cpus} CPU(s): eff is core-limited"
    rows = [{"bench": "multihost_scaling_cpu_proxy", "nproc": 2,
             "host_cpus": cpus,
             "tokens": int(m.group(1)), "agg_tps": float(m.group(2)),
             "scaling_eff": float(m.group(3)), "note": note}]
    if p is not None:
        rows.append({
            "bench": "multihost_overhead_proxy", "nproc": 2,
            "t_local_s": float(p.group(1)), "t_global_s": float(p.group(2)),
            "overhead_eff": float(p.group(3)),
            "note": ("equal-total-work proxy: same per-device compute on a "
                     "process-local vs the cross-process mesh; isolates "
                     "DCN-analog (gRPC) collective overhead — the "
                     "core-limited host cannot show raw parallel speedup"),
        })
    for out in outs:
        for sm in re.finditer(
            r"ENGINE_SPMD_OK heavy=(\d) depth=(\d+) tokens=(\d+) "
            r"t_local=([\d.]+) t_global=([\d.]+) coupling_eff=([\d.]+)",
            out,
        ):
            rows.append({
                "bench": "multihost_engine_spmd", "nproc": 2,
                "decode_depth": int(sm.group(2)),
                "tokens": int(sm.group(3)),
                "t_local_s": float(sm.group(4)),
                "t_global_s": float(sm.group(5)),
                "coupling_eff": float(sm.group(6)),
                "tokens_exact": "yes",
                "note": ("ONE engine SPMD across 2 processes "
                         "(device_put_fn replication); tokens EXACTLY "
                         "equal the single-process golden. coupling_eff "
                         "is the distributed-CPU dispatch floor, not pod "
                         "behavior"),
            })
        if rows and rows[-1]["bench"] == "multihost_engine_spmd":
            break
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip", action="append", default=[])
    args = ap.parse_args(argv)

    records = []
    for script in SCRIPTS:
        if any(s in script for s in args.skip):
            continue
        cmd = [sys.executable, os.path.join(HERE, script)]
        if args.quick and script != "benchmark_train_mfu.py":
            cmd.append("--quick")
        print(f"== {script} ==", flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=3600)
        except subprocess.TimeoutExpired as e:
            err = e.stderr or b""
            if isinstance(err, bytes):
                err = err.decode("utf-8", "replace")
            records.append({
                "bench": script, "error": "timeout",
                "stderr_tail": err[-1500:],
            })
            continue
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:])
            records.append({
                "bench": script, "error": proc.returncode,
                "stderr_tail": proc.stderr[-1500:],
            })
            continue
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    pass

    if not any("multihost" in s for s in args.skip):
        records.extend(_multihost_scaling())

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    with open(os.path.join(HERE, "RESULTS.jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(HERE, "RESULTS.md"), "w") as f:
        f.write(f"# Benchmark grid results\n\nRun: {stamp}\n\n")
        by_bench = {}
        for r in records:
            by_bench.setdefault(r.get("bench", "?"), []).append(r)
        for bench, rows in by_bench.items():
            f.write(f"## {bench}\n\n")
            keys = sorted({k for r in rows for k in r if k != "bench"})
            f.write("| " + " | ".join(keys) + " |\n")
            f.write("|" + "---|" * len(keys) + "\n")
            for r in rows:
                f.write(
                    "| " + " | ".join(str(r.get(k, "")) for k in keys)
                    + " |\n"
                )
            f.write("\n")
    print(f"wrote {len(records)} records to benchmarks/RESULTS.{{md,jsonl}}")


if __name__ == "__main__":
    main()
