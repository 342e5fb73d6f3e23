"""Subprocess worker for tests/test_distributed.py: joins a jax.distributed
process group on CPU and compresses the given FASTQ. Every rank writes its own
archive; the test asserts all ranks' bytes equal the single-process archive."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coord, nproc, pid, fq, out = sys.argv[1:6]
    from minicom_tpu.parallel import distributed
    distributed.initialize(coord, num_processes=int(nproc),
                           process_id=int(pid))
    from minicom_tpu import compressor
    compressor.compress(fq, out)
    if os.environ.get("MTC_DIST_DECODE") == "1":
        compressor.decompress(out, out + ".dec")


if __name__ == "__main__":
    main()
