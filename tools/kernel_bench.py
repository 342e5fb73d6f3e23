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


def _force(out):
    """Force COMPLETION of a device computation by fetching one element.

    On the tunneled axon backend, block_until_ready can return before the
    program actually finishes (experimental platform) — r04's kernel table
    credited the scan codecs with Gsym/s they never had (measured r05:
    the same program timed with a fetch runs ~3000x longer). Fetching any
    element of the LAST output forces every queued program before it, since
    single-device execution is ordered."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[-1]).reshape(-1)[:1]


def _time(fn, *args, reps=30):
    """reps dispatches + ONE forcing fetch at the end: the single ~30 ms
    tunnel round trip amortizes to ~1 ms/rep (kept in — conservative)."""
    _force(fn(*args))                        # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return max((time.perf_counter() - t0) / reps, 1e-9)


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

    def report(name, seconds, rw_bytes, detail, seconds_small=None,
               rw_small=None):
        """seconds at the full size INCLUDES the per-dispatch tunnel
        overhead (~ms through this link); when a quarter-size timing is
        given, the MARGINAL throughput (Δbytes/Δtime between the two sizes)
        cancels the fixed dispatch cost — the honest on-chip estimate for a
        local deployment. The roofline fraction uses the marginal figure."""
        gbps = rw_bytes / seconds / 1e9
        rec = {"seconds": round(seconds, 5), "rw_bytes": rw_bytes,
               "GBps_incl_dispatch": round(gbps, 2), "detail": detail}
        if seconds_small is not None and seconds > seconds_small:
            marg = (rw_bytes - rw_small) / (seconds - seconds_small) / 1e9
            rec["GBps_marginal"] = round(marg, 2)
            rec["roofline_fraction"] = round(marg / hbm, 4)
        else:
            rec["roofline_fraction"] = round(gbps / hbm, 4)
        out["kernels"][name] = rec
        # dump incrementally: tunnel flakiness must not lose finished rows
        with open(os.path.join(REPO, f"KERNELS_r{round_no}.json"), "w") as f:
            json.dump(out, f, indent=1)

    # --- windowed contig sketch (merge stage) ---------------------------
    from minicom_tpu.ops.pallas_sketch import sketch_windowed_pallas_compact32
    from minicom_tpu.ops.sketch import sketch_windowed_compact32
    rows, Lmax, k, w, m = 2048, 512, 31, 19, 48
    codes = jnp.asarray(rng.integers(0, 4, (rows, Lmax), dtype=np.uint8))
    ln = jnp.asarray(np.full(rows, Lmax, np.int32))
    fn = (sketch_windowed_pallas_compact32
          if jax.default_backend() != "cpu" else sketch_windowed_compact32)
    s = _time(lambda c, l: fn(c, l, k, w, m), codes, ln)
    s0 = _time(lambda c, l: fn(c, l, k, w, m), codes[: rows // 4],
               ln[: rows // 4])
    rw = rows * Lmax + rows * (2 * m * 4 + 4)      # codes in + packed out
    report("sketch_windowed" + ("_pallas" if fn is not
           sketch_windowed_compact32 else "_xla"), s, rw,
           f"{rows}x{Lmax} codes, k={k} w={w} m={m}; "
           f"{rows * (Lmax - k + 1) / max(s - s0, 1e-9) * 0.75 / 1e6:.0f} "
           "marginal Mkmer/s", s0, rw // 4)

    # --- whole-read minimizer sketch (cluster stage) --------------------
    from minicom_tpu.ops.sketch import sketch_reads_dyn_gather_packed
    N, L = 1 << 17, 100
    store = jnp.asarray(rng.integers(0, 4, (N, L), dtype=np.uint8))
    rids = jnp.asarray(np.arange(N, dtype=np.int32))
    s = _time(lambda st, r: sketch_reads_dyn_gather_packed(st, r, 31),
              store, rids)
    s0 = _time(lambda st, r: sketch_reads_dyn_gather_packed(st, r, 31),
               store, rids[: N // 4])
    rw = N * L + N * 12
    report("sketch_reads_dyn", s, rw,
           f"{N} reads x {L} bp; "
           f"{N * 0.75 / max(s - s0, 1e-9) / 1e6:.1f} marginal Mreads/s",
           s0, rw // 4)

    # --- consensus scatter-add (cluster/merge consensus) ----------------
    from minicom_tpu.ops.consensus import scatter_counts_rid_u
    M, Tp = 1 << 17, 1 << 16
    u = np.zeros((2, M), np.int32)
    u[0] = rng.integers(0, N, M) * 2
    u[1] = rng.integers(0, Tp - L, M)
    ud = jnp.asarray(u)
    # scatter_counts_rid_u DONATES its count table: a fresh table per call
    # (device-side zeros, included in the timing — real passes pay it too);
    # reusing one donated buffer poisons every later dispatch and was why
    # earlier kernel-bench runs died at unrelated fetches
    s = _time(lambda st, uu: scatter_counts_rid_u(
        jnp.zeros((Tp, 4), jnp.int32), st, uu), store, ud)
    s0 = _time(lambda st, uu: scatter_counts_rid_u(
        jnp.zeros((Tp, 4), jnp.int32), st, uu), store, ud[:, : M // 4])
    # HBM traffic model: member-row gathers from the read store + the u
    # array in + one r/w sweep of the count table (the [Tp,4] table itself
    # is small enough to live in cache between updates — charging 8 B per
    # scattered base would overstate traffic and report >1x roofline)
    rw = M * L + M * 8 + 2 * Tp * 4 * 4
    report("consensus_scatter", s, rw,
           f"{M} members x {L} bp into {Tp} cols; "
           f"{M * L * 0.75 / max(s - s0, 1e-9) / 1e6:.0f} marginal Mbase/s",
           s0, rw // 4)

    # --- XOR-popcount verify (realign) ----------------------------------
    from minicom_tpu.ops.pallas_verify import (popcount_verify,
                                               popcount_verify_pallas)
    Nv, W = 1 << 18, (L + 15) // 16
    aw = jnp.asarray(rng.integers(0, 2**32, (Nv, W), dtype=np.uint32))
    bw = jnp.asarray(rng.integers(0, 2**32, (Nv, W), dtype=np.uint32))
    vf = (popcount_verify_pallas if jax.default_backend() != "cpu"
          else popcount_verify)
    s = _time(lambda a, b: vf(a, b), aw, bw)
    s0 = _time(lambda a, b: vf(a, b), aw[: Nv // 4], bw[: Nv // 4])
    rw = 2 * Nv * W * 4 + Nv * 4
    report("popcount_verify" + ("_pallas" if vf is popcount_verify_pallas
                                else "_xla"), s, rw,
           f"{Nv} candidate pairs x {W} words; "
           f"{Nv * 0.75 / max(s - s0, 1e-9) / 1e6:.1f} marginal Mpairs/s",
           s0, rw // 4)

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
    enc4 = device_rans._encode_program(T // 4)
    s = _time(lambda g: enc(g, valid, freq_d, cum_d)[1], grid, reps=10)
    s0 = _time(lambda g: enc4(g, valid[: T // 4], freq_d, cum_d)[1],
               grid[: T // 4], reps=10)
    rw = nb + nb // 2            # syms in + ~words out
    report("rans_encode", s, rw,
           f"{nb} syms x {device_rans.LANES} lanes; "
           f"{nb * 0.75 / max(s - s0, 1e-9) / 1e6:.0f} marginal Msym/s",
           s0, rw // 4)
    states, words, wcounts = enc(grid, valid, freq_d, cum_d)
    dec = device_rans._decode_program(T)
    s = _time(lambda st, w: dec(st, w, valid, freq_d, cum_d, slot_d),
              states, words, reps=10)
    st4, w4, _ = enc4(grid[: T // 4], valid[: T // 4], freq_d, cum_d)
    dec4 = device_rans._decode_program(T // 4)
    s0 = _time(lambda st, w: dec4(st, w, valid[: T // 4], freq_d, cum_d,
                                  slot_d), st4, w4, reps=10)
    report("rans_decode", s, rw,
           f"{nb} syms; {nb * 0.75 / max(s - s0, 1e-9) / 1e6:.0f} "
           "marginal Msym/s", s0, rw // 4)

    # --- context-modeled rANS (order-k device entropy, r05) -------------
    # in a SUBPROCESS: on the tunneled backend this program occasionally
    # hits a spurious TPU InvalidArgument when compiled after the Pallas
    # kernels above in the same client; a fresh client measures cleanly
    import subprocess
    try:
        child = subprocess.run([sys.executable, "-c", r"""
import json, time
import numpy as np
rng = np.random.default_rng(5)
from minicom_tpu.entropy import device_ctx_rans as dcr
A, k = 16, 2
nbc = 1 << 21
steps = rng.integers(-1, 2, nbc).cumsum() % A
data = (steps + 48).astype(np.uint8).tobytes()
blob = dcr.compress(data, k=k)
dcr.decompress(blob)                      # compile + warm
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    dcr.decompress(blob)
print(json.dumps({"s": (time.perf_counter() - t0) / reps,
                  "nbc": nbc, "A": A, "k": k}))
"""], capture_output=True, text=True, timeout=2400,
                               env={**os.environ,
                                    "PYTHONPATH": REPO + os.pathsep
                                    + os.environ.get("PYTHONPATH", "")})
    except subprocess.TimeoutExpired:
        child = None
    for line in reversed(child.stdout.strip().splitlines()
                         if child else []):
        try:
            r = json.loads(line)
            report("ctx_rans_decode_e2e", r["s"], r["nbc"] + r["nbc"] // 2,
                   f"{r['nbc']} syms A={r['A']} k={r['k']} (incl. host "
                   f"framing); {r['nbc'] / r['s'] / 1e6:.0f} Msym/s")
            break
        except (json.JSONDecodeError, KeyError):
            continue
    else:
        out["kernels"]["ctx_rans_decode_e2e"] = {
            "error": (child.stderr[-500:] if child
                      else "timeout (tunnel compiles)")}

    path = os.path.join(REPO, f"KERNELS_r{round_no}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
