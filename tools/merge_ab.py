"""A/B: merge-consensus fidelity (splice vs member re-vote) and probe-cap
breadth, measured end-to-end on the synthetic bench input.

Usage: python tools/merge_ab.py [n_reads] [out.json]

The reference rebuilds every merged contig from its members
(construct_ref2, kthread_cb.c:105-218) and bounds neither the probes per
contig nor the hits per probe (kthread_cb.c:267-274). The rebuild makes both
choices explicit knobs (CompressorConfig.merge_revote / merge_rank_cap /
merge_probe_cap); this script commits the measured size/time tradeoff.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    from bench import make_dataset
    from minicom_tpu import CompressorConfig, compressor

    tmp = tempfile.mkdtemp(prefix="mtc_ab_")
    fq = os.path.join(tmp, "ab.fastq")
    make_dataset(fq, n_reads)

    variants = {
        "revote": {},                             # defaults: revote, 128/64
        "splice": {"merge_revote": False},
        "narrow_caps": {"merge_rank_cap": 48, "merge_probe_cap": 24},  # r02
        "wide_caps": {"merge_rank_cap": 256, "merge_probe_cap": 256},
    }
    results = {"n_reads": n_reads}
    for name, kw in variants.items():
        arc = os.path.join(tmp, name + ".mtc")
        compressor.compress(fq, arc, CompressorConfig(**kw))  # compile warmup
        t0 = time.time()
        s = compressor.compress(fq, arc, CompressorConfig(**kw))
        results[name] = {
            "archive_bytes": s["archive_bytes"],
            "encode_s": round(time.time() - t0, 2),
            "merge_s": s["timings_s"]["merge"],
            "clusters_merged": s["clusters_merged"],
            "probe_drops": s.get("merge_probe_drops", 0),
            "rank_saturated": s.get("merge_rank_saturated", 0),
        }
        print(name, json.dumps(results[name]), flush=True)
    base = results["splice"]["archive_bytes"]
    results["revote_size_gain_pct"] = round(
        100 * (base - results["revote"]["archive_bytes"]) / base, 3)
    print(json.dumps(results))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
