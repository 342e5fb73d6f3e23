"""Subprocess worker for tools/scaling.py: joins a jax.distributed process
group on the CPU backend, compresses the given FASTQ, and prints one JSON
line with its encode wall time (measured around compress() only, so process
startup/import time does not pollute the scaling numbers)."""

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
    cfg = CompressorConfig(threads=int(threads))
    t0 = time.time()
    compressor.compress(fq, out, cfg)
    print(json.dumps({"pid": int(pid), "encode_s": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    main()
