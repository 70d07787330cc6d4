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
    print("| tower | H | catalog | B | L | loss family | dtype | opt | head | mesh | e2e seq/s | device-only | MFU | Pallas train |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in data["rows"]:
        fam = r.get("family", "CCE").upper() if r.get("family") else "CCE"
        L = r.get("L", 30)
        mesh = r.get("mesh", "—")
        if r.get("error"):
            print(
                f"| {r['tower']} | {r['H']} | {r['catalog']//1000}k | {r['B']} "
                f"| {L} | {fam} | {r['dtype']} | {r['opt']} | — | {mesh} "
                f"| {r['error']} | | | |"
            )
            continue
        if r.get("family") == "margin":
            loss = "stream" if r.get("streaming_margin") else "dense (ctl)"
        elif r.get("family") in ("bpr", "cluster"):
            loss = "S=256"
        else:
            loss = "stream" if r.get("streaming_cce") else "dense"
            if r.get("no_stream"):
                loss = "dense (ctl)"
        opt = r["opt"].replace("adam_bf16m", "adam/bf16m")
        if r.get("emb"):
            opt += f"+emb{r['emb']}"
        pal = "on" if r.get("pallas_train") else "off"
        if r.get("no_pallas"):
            pal = "off (ctl)"
        print(
            f"| {r['tower']} | {r['H']} | {r['catalog']//1000}k | {r['B']} "
            f"| {L} | {fam} | {r['dtype']} | {opt} | {loss} | {mesh} "
            f"| {r['e2e_seq_per_s']/1000:.1f}k "
            f"| {(r['device_only'] or 0)/1000:.1f}k | {r['mfu_pct']}% | {pal} |"
        )


if __name__ == "__main__":
    main()
