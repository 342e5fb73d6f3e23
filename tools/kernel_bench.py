"""Device-kernel throughput vs the chip's memory roofline (VERDICT r03
item 8: real chip-utilization numbers, not blocked-wall fractions).

Measures the package's top device kernels with DEVICE-RESIDENT inputs
(block_until_ready timing, compile excluded), reporting bytes/s against the
HBM roofline — these ops are elementwise/gather/scatter shaped, so the
memory-bound roofline is the relevant ceiling, not the MXU:

* windowed contig sketch (Pallas, ops/pallas_sketch.py) — merge stage,
* whole-read minimizer sketch (XLA, ops/sketch.py) — cluster stage,
* consensus scatter-add (ops/consensus.py) — cluster/merge consensus,
* XOR-popcount verify (Pallas, ops/pallas_verify.py) — realign verify.

Writes KERNELS_r<N>.json. Usage: python tools/kernel_bench.py [round_no]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e HBM ~819 GB/s; v4 ~1228; fallback figure used only for the ratio
_HBM_GBPS = {"tpu v5 lite": 819.0, "tpu v5e": 819.0, "tpu v4": 1228.0}


def _time(fn, *args, reps=30):
    fn(*args).block_until_ready()            # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "04"
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    hbm = next((v for k, v in _HBM_GBPS.items() if k in kind), 819.0)
    out = {"backend": jax.default_backend(), "device_kind": kind,
           "hbm_roofline_GBps": hbm, "kernels": {}}
    rng = np.random.default_rng(5)

    def report(name, seconds, rw_bytes, detail):
        gbps = rw_bytes / seconds / 1e9
        out["kernels"][name] = {
            "seconds": round(seconds, 5), "rw_bytes": rw_bytes,
            "GBps": round(gbps, 2),
            "roofline_fraction": round(gbps / hbm, 4), "detail": detail}

    # --- windowed contig sketch (merge stage) ---------------------------
    from minicom_tpu.ops.pallas_sketch import sketch_windowed_pallas_compact32
    from minicom_tpu.ops.sketch import sketch_windowed_compact32
    rows, Lmax, k, w, m = 2048, 512, 31, 19, 48
    codes = jnp.asarray(rng.integers(0, 4, (rows, Lmax), dtype=np.uint8))
    ln = jnp.asarray(np.full(rows, Lmax, np.int32))
    fn = (sketch_windowed_pallas_compact32
          if jax.default_backend() != "cpu" else sketch_windowed_compact32)
    s = _time(lambda c, l: fn(c, l, k, w, m), codes, ln)
    rw = rows * Lmax + rows * (2 * m * 4 + 4)      # codes in + packed out
    report("sketch_windowed" + ("_pallas" if fn is not
           sketch_windowed_compact32 else "_xla"), s, rw,
           f"{rows}x{Lmax} codes, k={k} w={w} m={m}; "
           f"{rows * (Lmax - k + 1) / s / 1e6:.0f} Mkmer/s")

    # --- whole-read minimizer sketch (cluster stage) --------------------
    from minicom_tpu.ops.sketch import sketch_reads_dyn_gather_packed
    N, L = 1 << 17, 100
    store = jnp.asarray(rng.integers(0, 4, (N, L), dtype=np.uint8))
    rids = jnp.asarray(np.arange(N, dtype=np.int32))
    s = _time(lambda st, r: sketch_reads_dyn_gather_packed(st, r, 31),
              store, rids)
    rw = N * L + N * 12
    report("sketch_reads_dyn", s, rw,
           f"{N} reads x {L} bp; {N / s / 1e6:.1f} Mreads/s")

    # --- consensus scatter-add (cluster/merge consensus) ----------------
    from minicom_tpu.ops.consensus import scatter_counts_rid_u
    M, Tp = 1 << 17, 1 << 16
    u = np.zeros((2, M), np.int32)
    u[0] = rng.integers(0, N, M) * 2
    u[1] = rng.integers(0, Tp - L, M)
    ud = jnp.asarray(u)
    table = jnp.zeros((Tp, 4), jnp.int32)
    s = _time(lambda t, st, uu: scatter_counts_rid_u(t, st, uu),
              table, store, ud)
    # HBM traffic model: member-row gathers from the read store + the u
    # array in + one r/w sweep of the count table (the [Tp,4] table itself
    # is small enough to live in cache between updates — charging 8 B per
    # scattered base would overstate traffic and report >1x roofline)
    rw = M * L + M * 8 + 2 * Tp * 4 * 4
    report("consensus_scatter", s, rw,
           f"{M} members x {L} bp into {Tp} cols; "
           f"{M * L / s / 1e6:.0f} Mbase/s")

    # --- XOR-popcount verify (realign) ----------------------------------
    from minicom_tpu.ops.pallas_verify import (popcount_verify,
                                               popcount_verify_pallas)
    Nv, W = 1 << 18, (L + 15) // 16
    aw = jnp.asarray(rng.integers(0, 2**32, (Nv, W), dtype=np.uint32))
    bw = jnp.asarray(rng.integers(0, 2**32, (Nv, W), dtype=np.uint32))
    vf = (popcount_verify_pallas if jax.default_backend() != "cpu"
          else popcount_verify)
    s = _time(lambda a, b: vf(a, b), aw, bw)
    rw = 2 * Nv * W * 4 + Nv * 4
    report("popcount_verify" + ("_pallas" if vf is popcount_verify_pallas
                                else "_xla"), s, rw,
           f"{Nv} candidate pairs x {W} words; {Nv / s / 1e6:.1f} Mpairs/s")

    # --- on-chip interleaved rANS (entropy stage device path) -----------
    from minicom_tpu.entropy import device_rans
    import jax.numpy as jnp2
    nb = device_rans.BLOCK
    sym_np = rng.choice(np.arange(8, dtype=np.uint8), nb,
                        p=[.4, .2, .1, .1, .08, .06, .04, .02])
    counts = np.bincount(sym_np, minlength=256)
    freq_q = device_rans.quantize_freqs(counts)
    freq_d, cum_d, slot_d = device_rans._tables(freq_q)
    T = nb // device_rans.LANES
    grid = jnp2.asarray(sym_np.reshape(T, device_rans.LANES))
    valid = jnp2.ones((T, device_rans.LANES), bool)
    enc = device_rans._encode_program(T)
    s = _time(lambda g: enc(g, valid, freq_d, cum_d)[1], grid, reps=10)
    rw = nb + nb // 2            # syms in + ~words out
    report("rans_encode", s, rw,
           f"{nb} syms x {device_rans.LANES} lanes; "
           f"{nb / s / 1e6:.0f} Msym/s")
    states, words, wcounts = enc(grid, valid, freq_d, cum_d)
    dec = device_rans._decode_program(T)
    s = _time(lambda st, w: dec(st, w, valid, freq_d, cum_d, slot_d),
              states, words, reps=10)
    report("rans_decode", s, rw,
           f"{nb} syms; {nb / s / 1e6:.0f} Msym/s")

    # --- context-modeled rANS (order-k device entropy, r05) -------------
    from minicom_tpu.entropy import device_ctx_rans as dcr
    A, k = 16, 2
    nbc = 1 << 21
    # markov-ish source so the tables are non-trivial
    steps = rng.integers(-1, 2, nbc).cumsum() % A
    data = (steps + 48).astype(np.uint8).tobytes()
    blob = dcr.compress(data, k=k)
    s0 = time.perf_counter()
    dcr.decompress(blob)                      # compile + warm
    _ = time.perf_counter() - s0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        dcr.decompress(blob)
    s = (time.perf_counter() - t0) / reps
    report("ctx_rans_decode_e2e", s, nbc + nbc // 2,
           f"{nbc} syms A={A} k={k} (incl. host framing); "
           f"{nbc / s / 1e6:.0f} Msym/s")

    path = os.path.join(REPO, f"KERNELS_r{round_no}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
