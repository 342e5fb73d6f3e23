"""Build and run the REFERENCE compressor head-to-head on a FASTQ.

The reference (yuansliu/minicom) recompiles per input: the shell writes
src/config.h with the read length + tuning macros and runs make
(/root/reference/minicom:56-106). This tool reproduces that flow in a
scratch copy of the source tree, runs the produced `minicomsg`, then
entropy-codes the raw stream groups exactly as `minicom:110-148` does —
substituting `xz -9e` for the bsc binary that install.sh would download
(no network in this environment; same substitution applied to both sides
would be a wash, but our archive uses the package's own codecs, so the
comparison below is reference-pipeline+xz vs minicom_tpu end-to-end).

Usage: python tools/ref_compare.py IN.fastq [--threads N] [--keep]
Prints one JSON line: {"ref_stream_bytes": ..., "ref_wall_s": ..., ...}.

The reference build is cached per (readlen, threads) under /tmp so repeat
benchmarks skip the ~1 min compile.
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import lzma
import os
import shutil
import subprocess
import sys
import tarfile
import tempfile
import time

REF_SRC = "/root/reference/src"

_XZ_FILTERS = [{"id": lzma.FILTER_LZMA2, "preset": 9 | lzma.PRESET_EXTREME}]


def xz(data: bytes) -> bytes:
    return lzma.compress(data, format=lzma.FORMAT_RAW, filters=_XZ_FILTERS)


def read_len_of(fastq: str) -> int:
    with open(fastq, "rb") as f:
        f.readline()
        return len(f.readline().strip())


def build_reference(readlen: int, threads: int) -> str:
    """Returns the path of a built minicomsg binary (cached)."""
    cache = f"/tmp/minicom_ref_build_L{readlen}_t{threads}"
    binary = os.path.join(cache, "src", "minicomsg")
    if os.path.exists(binary):
        return binary
    shutil.rmtree(cache, ignore_errors=True)
    os.makedirs(cache)
    shutil.copytree(REF_SRC, os.path.join(cache, "src"))
    # config.h exactly as minicom:56-91 writes it (SG mode, default knobs)
    cfg = [
        "#pragma once",
        f"#define readlen {readlen}",
        f"#define num_thr {threads}",
        '#define uniqid "uref"',
        '#define output "scratch/"',
        "#define inik 0",
        "#define inithr 0",
        "#define inimaxthr 0",
        "#define inistep 0",
        "#define ininumdict 0",
        "#define iniw 0",
        "#define inim 0",
        "#define inicbthr 0",
        "#define inimaxrounds 0",
    ]
    with open(os.path.join(cache, "src", "config.h"), "w") as f:
        f.write("\n".join(cfg) + "\n")
    subprocess.run(["make", "-C", os.path.join(cache, "src"), "minicomsg"],
                   check=True, capture_output=True)
    return binary


def run_reference(fastq: str, threads: int = 24, keep: bool = False) -> dict:
    readlen = read_len_of(fastq)
    binary = build_reference(readlen, threads)
    work = tempfile.mkdtemp(prefix="minicom_ref_run_")
    out = os.path.join(work, "comp")
    os.makedirs(out)
    os.makedirs(os.path.join(work, "scratch"))
    t0 = time.time()
    subprocess.run([binary, os.path.abspath(fastq), out], check=True,
                   cwd=work, capture_output=True)
    wall = time.time() - t0

    # stream groups exactly as minicom:110-148 tars them
    groups = {
        "dif_char": "dif_char.txt.*",
        "begposbin": "beg_pos.bin.*",
        "refbin": "ref.bin.*",
        "dirbin": "dir.bin.*",
    }
    sizes = {}
    total = 0
    for gname, pat in groups.items():
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tf:
            for p in sorted(glob.glob(os.path.join(out, pat))):
                tf.add(p, arcname=os.path.basename(p))
        blob = xz(buf.getvalue())
        sizes[gname] = len(blob)
        total += len(blob)
    for fname in ["single_N.seq", "single.seq", "AA.txt", "TT.txt", "NN.txt"]:
        p = os.path.join(out, fname)
        data = open(p, "rb").read() if os.path.exists(p) else b""
        blob = xz(data)
        sizes[fname] = len(blob)
        total += len(blob)
    info = os.path.join(out, "info.txt")
    info_len = os.path.getsize(info) if os.path.exists(info) else 0
    total += info_len
    if not keep:
        shutil.rmtree(work, ignore_errors=True)
    return {"ref_stream_bytes": total, "ref_wall_s": round(wall, 2),
            "ref_threads": threads, "ref_sizes": sizes,
            "ref_dir": out if keep else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fastq")
    ap.add_argument("--threads", type=int, default=24)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    print(json.dumps(run_reference(args.fastq, args.threads, args.keep)))


if __name__ == "__main__":
    main()
