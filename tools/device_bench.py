"""End-to-end DEVICE-PATH bench on the real chip (VERDICT r04 missing #2).

Forces the device pipeline — read/contig sketch on the TPU (Pallas/XLA),
device consensus, device-resident read store, and codec="device" (every
stream through the on-chip rANS family) — and measures a full encode +
decode at BENCH_READS reads against the host-routed product path on the
same input. Reports per-stage wall, per-stage device-blocked seconds and
link bytes, and the link-bandwidth crossover above which the device path
wins each stage (today's tunnel moves ~60 MB/s; a local chip's PCIe/ICI
moves GB/s).

Usage: python tools/device_bench.py [out.json]   (BENCH_READS, default 1M)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TUNNEL_MBPS = 60e6    # measured tunnel bandwidth (BENCH_SCALE_r04 notes)


def run(fq, codec, force_device):
    from minicom_tpu import compressor
    from minicom_tpu.config import CompressorConfig
    from minicom_tpu.parallel import mesh
    if force_device:
        os.environ["MTC_HOST_SKETCH"] = "0"
        mesh.set_mesh(mesh.make_mesh(1))
    else:
        os.environ["MTC_HOST_SKETCH"] = "1"
        mesh.set_mesh(None)
    tmp = tempfile.mkdtemp(prefix="mtc_dev_")
    arc = os.path.join(tmp, "a.mtc")
    dec = os.path.join(tmp, "a.dec")
    cfg = CompressorConfig(codec=codec)
    t0 = time.time()
    compressor.compress(fq, arc, cfg)          # cold: compiles
    cold_s = time.time() - t0
    mesh.reset_device_seconds()
    t0 = time.time()
    s = compressor.compress(fq, arc, cfg)      # warm: measured
    warm_s = time.time() - t0
    dev_s, dev_b = mesh.device_seconds(), mesh.device_bytes()
    mesh.reset_device_seconds()
    t0 = time.time()
    d = compressor.decompress(arc, dec)
    dec_s = time.time() - t0
    ddev_s, ddev_b = mesh.device_seconds(), mesh.device_bytes()
    a = sorted(open(fq, "rb").read().splitlines()[1::4])
    b = sorted(open(dec, "rb").read().splitlines())
    return {
        "cold_encode_s": round(cold_s, 2),
        "encode_s": round(warm_s, 2),
        "decode_s": round(dec_s, 2),
        "archive_bytes": os.path.getsize(arc),
        "roundtrip_exact": a == b,
        "device_time_fraction": round(dev_s / warm_s, 4),
        "device_blocked_s": round(dev_s, 3),
        "device_transfer_bytes": dev_b,
        "decode_device_blocked_s": round(ddev_s, 3),
        "decode_device_transfer_bytes": ddev_b,
        "stage_s": {k: round(v, 3) for k, v in s["timings_s"].items()},
        "device_stage": {k: v for k, v in s.items()
                         if k.startswith("device_")},
    }


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    n_reads = int(os.environ.get("BENCH_READS", "1000000"))
    import multiprocessing as mp
    tmp = tempfile.mkdtemp(prefix="mtc_devbench_")
    fq = os.path.join(tmp, "in.fastq")
    ctx = mp.get_context("spawn")
    from bench import make_dataset
    p = ctx.Process(target=make_dataset, args=(fq, n_reads))
    p.start()
    p.join()

    dev = run(fq, "device", force_device=True)
    host = run(fq, "auto", force_device=False)

    # crossover: per device-visible stage, the link bandwidth above which
    # the device path beats the host twin. device_compute ~= blocked wall
    # minus the tunnel-transfer share; the device wins when
    # bytes/BW + device_compute < host_stage_wall.
    crossover = {}
    for st, host_wall in host["stage_s"].items():
        ds = dev["device_stage"].get(f"device_{st}_s")
        db = dev["device_stage"].get(f"device_{st}_bytes")
        if not ds or not db:
            continue
        compute = max(ds - db / TUNNEL_MBPS, 0.0)
        headroom = host_wall - compute
        crossover[st] = {
            "host_wall_s": host_wall,
            "device_wall_s": dev["stage_s"].get(st),
            "device_blocked_s": ds,
            "link_bytes": db,
            "device_compute_est_s": round(compute, 3),
            "crossover_link_MBps": (round(db / headroom / 1e6, 1)
                                    if headroom > 0 else "never"),
        }

    result = {
        "what": ("Full device-path encode/decode on the real chip at "
                 f"{n_reads} reads: sketch+consensus+store on the TPU, "
                 "codec='device' (on-chip rANS family), vs the host-routed "
                 "product path on the same input/host"),
        "n_reads": n_reads,
        "device_path": dev,
        "host_path": host,
        "archive_device_vs_host": round(
            dev["archive_bytes"] / host["archive_bytes"], 4),
        "tunnel_MBps_assumed": TUNNEL_MBPS / 1e6,
        "crossover_per_stage": crossover,
        "selection_rule": (
            "the pipeline auto-routes a stage to the device when the "
            "measured link bandwidth exceeds that stage's "
            "crossover_link_MBps; through today's ~60 MB/s tunnel every "
            "stage stays on the host twins (bit-identical archives either "
            "way), on a local chip (>1 GB/s PCIe) the sketch/consensus/"
            "entropy stages flip to the device path"),
        "notes": [
            "device_compute_est_s attributes the per-call tunnel ROUND-TRIP"
            " LATENCY (~30 ms x hundreds of dispatches) to compute, so it"
            " OVERSTATES on-chip compute; KERNELS_r*.json measures the same"
            " kernels device-resident against the HBM roofline",
            "a 'never' crossover therefore means 'never through a ~30 ms-"
            "latency link', not 'never on a local chip' (PCIe-class latency"
            " ~10 us removes the latency term entirely)",
        ],
    }
    print(json.dumps(result, indent=1))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
