"""Render bench_matrix.json as the BASELINE.md markdown table.

Usage: python scripts/matrix_to_md.py [path]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_matrix.json"
    with open(path) as f:
        data = json.load(f)
    print(f"measured_at: {data['measured_at']}")
    print()
    print("| tower | H | catalog | B | dtype | opt | loss | e2e seq/s | device-only | MFU | Pallas train |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in data["rows"]:
        if r.get("error"):
            print(
                f"| {r['tower']} | {r['H']} | {r['catalog']//1000}k | {r['B']} "
                f"| {r['dtype']} | {r['opt']} | — | {r['error']} | | | |"
            )
            continue
        loss = "stream" if r.get("streaming_cce") else "dense"
        if r.get("no_stream"):
            loss = "dense (ctl)"
        opt = r["opt"].replace("adam_bf16m", "adam/bf16m")
        pal = "on" if r.get("pallas_train") else "off"
        if r.get("no_pallas"):
            pal = "off (ctl)"
        print(
            f"| {r['tower']} | {r['H']} | {r['catalog']//1000}k | {r['B']} "
            f"| {r['dtype']} | {opt} | {loss} | {r['e2e_seq_per_s']/1000:.1f}k "
            f"| {(r['device_only'] or 0)/1000:.1f}k | {r['mfu_pct']}% | {pal} |"
        )


if __name__ == "__main__":
    main()
