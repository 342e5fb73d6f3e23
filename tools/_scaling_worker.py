"""Subprocess worker for tools/scaling.py: joins a jax.distributed process
group on the CPU backend, compresses the given FASTQ, and prints one JSON
line with its encode wall time (measured around compress() only, so process
startup/import time does not pollute the scaling numbers) plus the per-stage
and sub-stage splits — scaling.py uses them to attribute sharded vs
replicated host seconds (VERDICT r03 item 4)."""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nproc, pid, threads, fq, out = sys.argv[1:7]
    if int(nproc) > 1:
        from minicom_tpu.parallel import distributed
        distributed.initialize(coord, num_processes=int(nproc),
                               process_id=int(pid))
    from minicom_tpu import CompressorConfig, compressor
    from minicom_tpu.stats import StageStats
    cfg = CompressorConfig(threads=int(threads))
    st = StageStats()
    t0 = time.time()
    compressor.compress(fq, out, cfg, stats=st)
    encode_s = round(time.time() - t0, 3)
    dec_s = None
    if os.environ.get("MTC_SCALE_DECODE") == "1":
        t0 = time.time()
        compressor.decompress(out, out + f".dec{pid}" if
                              os.environ.get("MTC_WRITE_ALL_RANKS") == "1"
                              else out + ".dec")
        dec_s = round(time.time() - t0, 3)
    # VmHWM, not getrusage: Linux keeps the PARENT's ru_maxrss across
    # fork+exec, which silently reports the harness's dataset-generation
    # peak instead of this worker's
    try:
        rss = int(open("/proc/self/status").read()
                  .split("VmHWM:")[1].split()[0]) * 1024
    except Exception:
        import resource
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    print(json.dumps({
        "pid": int(pid), "encode_s": encode_s, "decode_s": dec_s,
        "peak_rss_bytes": rss,
        "stage_s": {k: round(v, 3) for k, v in st.timings.items()},
        "sub_stage_s": {k: v for k, v in st.counters.items()
                        if k.endswith("_s") and isinstance(v, float)}}))


if __name__ == "__main__":
    main()
