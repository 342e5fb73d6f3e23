"""ORDER (-p) and paired-end modes at benchmark scale (VERDICT r03 item 3).

The r03 proof ran the flagship unordered mode at 5M reads; ORDER and PE had
only toy-scale coverage. This harness runs both modes end-to-end at
BENCH_READS scale, each phase in its own subprocess so peak RSS is
attributable per (mode, phase), and checks the strict roundtrips:

* ORDER: decompressed sequence i must equal input sequence i (exact order),
* PE: the multiset of (mate1, mate2) pairs is preserved (line i of file 2 is
  the mate of line i of file 1 — the reference emits file 1 in emission
  order, not input order, kthread_dump_pe.c:218-619).

Writes BENCH_MODES_r<N>.json at the repo root. Usage:

    BENCH_READS=2000000 python tools/bench_modes.py [round_no]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, resource, sys, time
sys.path.insert(0, {repo!r})
from minicom_tpu import compressor
from minicom_tpu.config import CompressorConfig
t0 = time.time()
kind = {kind!r}
if kind == "compress":
    summary = compressor.compress({inp!r}, {out!r},
                                  CompressorConfig(**{cfg!r}),
                                  reads_path2={inp2!r})
elif kind == "decompress":
    summary = compressor.decompress({inp!r}, {out!r}, {out2!r})
wall = time.time() - t0
# peak RSS from /proc (VmHWM): Linux does NOT reset ru_maxrss across
# fork+exec, so getrusage in a subprocess reports the PARENT's peak
# (the dataset generator's temporaries) — measured 9.3 GB of phantom RSS
try:
    rss = int(open("/proc/self/status").read()
              .split("VmHWM:")[1].split()[0]) * 1024
except Exception:
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
print(json.dumps({{"wall_s": round(wall, 2), "peak_rss_bytes": rss,
                   "stage_s": summary.get("timings_s", {{}})}}))
"""


def _run(kind, inp, out, cfg=None, inp2=None, out2=None) -> dict:
    code = _CHILD.format(repo=REPO, kind=kind, inp=inp, out=out,
                         cfg=cfg or {}, inp2=inp2, out2=out2)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=7200, cwd=REPO)
    if r.returncode != 0:
        raise RuntimeError(f"{kind} failed:\n{r.stderr[-3000:]}")
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from {kind} child:\n{r.stdout[-2000:]}")


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "04"
    n_reads = int(os.environ.get("BENCH_READS", "2000000"))
    tmp = tempfile.mkdtemp(prefix="mtc_modes_")
    fq = os.path.join(tmp, "modes.fastq")
    sys.path.insert(0, REPO)
    from bench import make_dataset
    seq_bytes = make_dataset(fq, n_reads)
    L = len(open(fq, "rb").read(4096).splitlines()[1])
    base_per = n_reads * L
    results = {"n_reads": n_reads, "readlen": L, "seq_bytes": seq_bytes}

    # ---- ORDER mode -----------------------------------------------------
    arc = os.path.join(tmp, "order.mtc")
    dec = os.path.join(tmp, "order.reads")
    enc = _run("compress", fq, arc, cfg={"order": True})
    dcc = _run("decompress", arc, dec)
    inp_lines = open(fq, "rb").read().splitlines()[1::4]
    got = open(dec, "rb").read().splitlines()
    results["order"] = {
        "encode_s": enc["wall_s"],
        "encode_MBps": round(seq_bytes / 1e6 / enc["wall_s"], 3),
        "encode_rss_B_per_base": round(enc["peak_rss_bytes"] / base_per, 2),
        "decode_s": dcc["wall_s"],
        "decode_MBps": round(seq_bytes / 1e6 / dcc["wall_s"], 3),
        "decode_rss_B_per_base": round(dcc["peak_rss_bytes"] / base_per, 2),
        "archive_bytes": os.path.getsize(arc),
        "roundtrip_exact_ordered": got == inp_lines,
        "stage_s": enc["stage_s"],
    }
    print(json.dumps({"order": results["order"]}))
    os.unlink(dec)

    # ---- PE mode --------------------------------------------------------
    # split the read set into two mate files of equal count
    half = n_reads // 2
    fq1 = os.path.join(tmp, "modes_1.fastq")
    fq2 = os.path.join(tmp, "modes_2.fastq")
    with open(fq, "rb") as f, open(fq1, "wb") as f1, open(fq2, "wb") as f2:
        for i in range(2 * half):
            rec = b"".join(f.readline() for _ in range(4))
            (f1 if i < half else f2).write(rec)
    arc = os.path.join(tmp, "pe.mtc")
    d1 = os.path.join(tmp, "pe_1.reads")
    d2 = os.path.join(tmp, "pe_2.reads")
    enc = _run("compress", fq1, arc, inp2=fq2)
    dcc = _run("decompress", arc, d1, out2=d2)
    pe_bases = 2 * half * L
    pe_bytes = 2 * half * (L + 1)
    got = sorted(zip(open(d1, "rb").read().splitlines(),
                     open(d2, "rb").read().splitlines()))
    want = sorted(zip(open(fq1, "rb").read().splitlines()[1::4],
                      open(fq2, "rb").read().splitlines()[1::4]))
    ok1 = ok2 = got == want
    results["pe"] = {
        "encode_s": enc["wall_s"],
        "encode_MBps": round(pe_bytes / 1e6 / enc["wall_s"], 3),
        "encode_rss_B_per_base": round(enc["peak_rss_bytes"] / pe_bases, 2),
        "decode_s": dcc["wall_s"],
        "decode_MBps": round(pe_bytes / 1e6 / dcc["wall_s"], 3),
        "decode_rss_B_per_base": round(dcc["peak_rss_bytes"] / pe_bases, 2),
        "archive_bytes": os.path.getsize(arc),
        "roundtrip_exact_paired": bool(ok1),
        "stage_s": enc["stage_s"],
    }
    path = os.path.join(REPO, f"BENCH_MODES_r{round_no}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
