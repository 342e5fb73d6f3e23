"""Multi-process encode scaling measurement (VERDICT r03 item 6).

Real multi-chip hardware is unavailable in this environment, so this measures
what can be measured: end-to-end encode wall time at 1/2/4 jax.distributed
processes with CPU collectives on one host (the tests/test_distributed.py
harness at benchmark scale), plus the byte-identity of the archives across
process counts — the determinism property the reference cannot offer
(its format bakes in the thread count, kthread_dump.c:375).

Writes SCALING_r<N>.json at the repo root. Usage:

    SCALE_READS=1000000 python tools/scaling.py [round_no]

Caveat recorded in the output: this host has very few physical cores, so the
collectives AND the per-rank compute share them — parallel efficiency here is
a lower bound on what separate hosts would see (each rank's work is 1/P of
the dataset; on P real hosts the ranks would not contend).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "_scaling_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_group(nproc: int, fq: str, outdir: str, threads: int) -> dict:
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               MTC_WRITE_ALL_RANKS="0", MTC_SCALE_DECODE="1")
    out = os.path.join(outdir, f"p{nproc}.mtc")
    t0 = time.time()
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, coord, str(nproc), str(pid),
             str(threads), fq, out],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE))
    encode_s = []
    rank0 = {}
    for p in procs:
        stdout, stderr = p.communicate(timeout=7200)
        text = stdout.decode(errors="replace")
        if p.returncode != 0:
            err = stderr.decode(errors="replace")
            raise RuntimeError(
                f"rank failed (nproc={nproc}):\n{text[-1500:]}\n{err[-1500:]}")
        # scan backwards for the result line: libraries may append warnings
        # to stdout after the worker's JSON (JAX teardown noise is common)
        for line in reversed(text.strip().splitlines()):
            try:
                rec = json.loads(line)
                encode_s.append(rec["encode_s"])
                if rec.get("pid") == 0:
                    rank0 = rec
                break
            except (json.JSONDecodeError, KeyError):
                continue
        else:
            raise RuntimeError(f"no JSON result from rank:\n{text[-1500:]}")
    out_rec = {"nproc": nproc, "threads_per_rank": threads,
               "encode_s": max(encode_s), "wall_s": round(time.time() - t0, 3),
               "peak_rss_bytes_rank0": rank0.get("peak_rss_bytes"),
               "stage_s": rank0.get("stage_s", {}),
               "sub_stage_s": rank0.get("sub_stage_s", {}),
               "archive_bytes": os.path.getsize(out), "archive_path": out}
    if rank0.get("decode_s") is not None:
        out_rec["decode_s"] = rank0["decode_s"]
    return out_rec


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "03"
    n_reads = int(os.environ.get("SCALE_READS", "1000000"))
    ncpu = os.cpu_count() or 1
    tmp = tempfile.mkdtemp(prefix="mtc_scaling_")
    fq = os.path.join(tmp, "scale.fastq")
    sys.path.insert(0, REPO)
    from bench import make_dataset
    seq_bytes = make_dataset(fq, n_reads)

    # threads-matched baseline: 1 proc x 1 OpenMP thread. Comparing P procs
    # x 1 thread against it isolates PROCESS sharding from intra-process
    # threading (on a 2-core host the default comparison makes each rank
    # lose its second OpenMP thread as P grows, which reads as anti-scaling
    # even where the sharding itself is fine).
    base1 = run_group(1, fq, tmp, 1)
    base1 = run_group(1, fq, tmp, 1)  # second pass = warm measurement

    results = []
    procs = tuple(int(x) for x in
                  os.environ.get("SCALE_PROCS", "1,2,4").split(","))
    for nproc in procs:
        threads = max(1, ncpu // nproc)
        # run each group twice: the first pass pays the one-time XLA compiles
        # for this process topology (the persistent cache key includes it);
        # the second pass measures the pipeline. Cold-compile cost is a
        # per-machine constant already reported as bench.py's cold_encode_s.
        cold = run_group(nproc, fq, tmp, threads)
        r = run_group(nproc, fq, tmp, threads)
        r["cold_encode_s"] = cold["encode_s"]
        r["encode_MBps"] = round(seq_bytes / 1e6 / r["encode_s"], 3)
        results.append(r)
        print(json.dumps(r))

    base = open(results[0].pop("archive_path"), "rb").read()
    identical = all(open(r.pop("archive_path"), "rb").read() == base
                    for r in results[1:])
    for r in results:
        r.pop("archive_path", None)
    t1 = results[0]["encode_s"]
    t11 = base1["encode_s"]
    d1 = results[0].get("decode_s")
    for r in results:
        r["speedup_vs_1proc"] = round(t1 / r["encode_s"], 3)
        r["efficiency"] = round(t1 / r["encode_s"] / r["nproc"], 3)
        # vs the threads-matched 1proc x 1thread baseline: the process-
        # sharding contribution alone
        r["speedup_vs_1proc_1thread"] = round(t11 / r["encode_s"], 3)
        if d1 and r.get("decode_s"):
            r["decode_ratio_vs_1proc"] = round(r["decode_s"] / d1, 3)
    # sharded-vs-replicated attribution (VERDICT r03 item 4): a stage whose
    # per-rank seconds shrink ~1/P is sharded; one that stays flat is
    # replicated glue. Report the per-stage 2-proc/1-proc ratio so the
    # Amdahl ceiling is a measured number (on this few-core host the ratios
    # are inflated by core contention — they bound the replicated share
    # from above).
    s1 = results[0].get("stage_s", {})
    s2 = next((r.get("stage_s", {}) for r in results if r["nproc"] == 2), {})
    stage_ratio = {k: round(s2[k] / s1[k], 3)
                   for k in s1 if k in s2 and s1[k] > 0.05}
    # the sharding-only per-stage view: 2 procs x 1 thread vs 1 proc x
    # 1 thread (a ratio ~0.5 = fully sharded; ~1.0 = replicated)
    s11 = base1.get("stage_s", {})
    stage_ratio_1t = {k: round(s2[k] / s11[k], 3)
                      for k in s11 if k in s2 and s11[k] > 0.05}
    # memory-scaling evidence (VERDICT r04 missing #4): with the row-sharded
    # resident store, rank 0's peak RSS at P=2 must sit well below the P=1
    # peak — the store term halves while the replicated glue (cluster CSR,
    # sketch tables, shrinking realign singleton rows) stays
    rss1 = results[0].get("peak_rss_bytes_rank0")
    rss2 = next((r.get("peak_rss_bytes_rank0") for r in results
                 if r["nproc"] == 2), None)
    out = {
        "n_reads": n_reads, "seq_bytes": seq_bytes,
        "host_cpu_count": ncpu,
        "note": ("single host, CPU collectives; all ranks share "
                 f"{ncpu} cores, so efficiency is a lower bound vs real "
                 "multi-host"),
        "note_store_traffic": (
            "with the row-sharded store (r05) the cluster/merge stages "
            "exchange member rows through ordered all-gathers, which "
            "deliver every served row to EVERY rank (the only collective "
            "available on the multi-host CPU path is process_allgather) — "
            "a P-fold traffic redundancy that the loopback transport "
            "absorbs at memcpy speed here but a production DCN backend "
            "would avoid with an all-to-all; per-rank RSS is what the "
            "sharded store is buying (peak_rss_rank0_2proc_over_1proc)"),
        "archive_bytes_identical_across_nproc": identical,
        "peak_rss_rank0_2proc_over_1proc": (
            round(rss2 / rss1, 3) if rss1 and rss2 else None),
        "stage_s_ratio_2proc_over_1proc": stage_ratio,
        "stage_s_ratio_2proc_over_1proc_1thread": stage_ratio_1t,
        "baseline_1proc_1thread": {k: base1[k] for k in
                                   ("encode_s", "stage_s", "sub_stage_s")},
        "runs": results,
    }
    path = os.path.join(REPO, f"SCALING_r{round_no}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
