#!/usr/bin/env python3
"""Order-alternating sf3/sf10 scale probe for the similarity family.

Runs four subset-Bench invocations (sf3, sf10, sf10, sf3 — the same
order-alternation the r16 retrieval/CC probe used, so a monotone
window drift inflates one scale's FIRST run and the per-scale min
discards it), each itself min-of-3 passes, over the embedding-family
queries, and assembles PROBE_SIM_sf10.json in the PROBE_sf10.json
shape: per-run values, per-scale min, wall ratio vs the 3.33x data
ratio, and the calibration medians that gauge window stability.

p39 (semantic dedup) is deliberately EXCLUDED: its bench contract
pins maxCell=MaxValue so the hash matches the oracle's honest
all-pairs-per-cell model, which is contract-quadratic in sf by
design (like p04); the production operator's maxCell cap is covered
by its own stress test, not by this scale ladder.

Usage: probe_sim.py [sf3_dir sf10_dir]  (run from the repo root)
"""
import json
import re
import subprocess
import sys

QUERIES = ["p09_knn_brute", "p10_ann_lsh", "p13_ivf_topk",
           "p38_kmeans_train", "p41_ivf_nprobe", "p56_pq_encode",
           "p57_pq_adc_topk", "p58_ivf_pq", "p63_embed_decontam",
           "p68_ann_recall"]

RUNS = [("runA_sf3", "sf3"), ("runB_sf10", "sf10"),
        ("runC_sf10", "sf10"), ("runD_sf3", "sf3")]


def bench(sf_dir: str) -> dict:
    env = {"SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_ONLY": ",".join(QUERIES)}
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, check=True,
        env={**__import__("os").environ, **env}).stdout
    compact = None
    for line in out.splitlines():
        line = line.strip()
        if '"metric":"total"' in line and '"queries"' in line:
            compact = json.loads(re.search(r"\{.*\}", line).group(0))
    if compact is None:
        raise SystemExit(f"no compact bench line in output for {sf_dir}")
    if compact.get("errors"):
        raise SystemExit(f"bench errors at {sf_dir}: {compact['errors']}")
    return compact


def conclusion(per_query: dict) -> str:
    worst = max(per_query, key=lambda q: per_query[q]["wall_ratio"])
    w = per_query[worst]
    ratios = ", ".join(f"{q} {v['wall_ratio']}x"
                       for q, v in sorted(per_query.items()))
    verdict = ("NO KNEE: every wall ratio is below the 3.33x data ratio"
               if w["wall_ratio"] < w["data_ratio"] else
               f"KNEE CANDIDATE: {worst} at {w['wall_ratio']}x meets or "
               f"exceeds the {w['data_ratio']}x data ratio")
    return (f"{verdict} ({ratios}). Worst is {worst} at "
            f"{w['wall_ratio']}x. Fixed query/bench sides make "
            "linear-in-corpus the production-shaped worst case for the "
            "brute/encode stages; the IVF probe stages (p13/p41) sit "
            "flattest because nprobe caps the scored fraction of the "
            "corpus, and kmeans (p38) is iteration-overhead-dominated "
            "at these sizes.")


def main() -> None:
    sf3 = sys.argv[1] if len(sys.argv) > 2 else "local-data/sf3"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "local-data/sf10"
    dirs = {"sf3": sf3, "sf10": sf10}
    runs, cals = {}, {}
    for name, scale in RUNS:
        c = bench(dirs[scale])
        runs[name] = c["queries"]
        cals[name] = c["calibration"]["median"]
        print(f"[probe] {name}: total={c['value']}s "
              f"cal={cals[name]}s", flush=True)
    per_query = {}
    for q in sorted(runs["runA_sf3"]):
        v3 = min(runs["runA_sf3"][q], runs["runD_sf3"][q])
        v10 = min(runs["runB_sf10"][q], runs["runC_sf10"][q])
        per_query[q] = {"sf3_sec": v3, "sf10_sec": v10,
                        "wall_ratio": round(v10 / v3, 2),
                        "data_ratio": 3.33}
    artifact = {
        "metric": "probe_sim_sf10",
        "unit": "sec",
        "question": ("r16 left the similarity/embeddings family as the "
                     "one heavy family whose scale evidence was the "
                     "synthetic PROFILE_IVF 10x multiplier rather than "
                     "the GenScale sf3->sf10 ladder - extend the ladder "
                     "to kNN/ANN/IVF/PQ/kmeans/embed-decontam and "
                     "either confirm sub-linearity or find the knee"),
        "protocol": ("same-window ORDER-ALTERNATING runs (sf3,sf10,"
                     "sf10,sf3), min-of-3 subset Bench per run, "
                     "per-scale value = min across the two runs; "
                     "sf3 = GenScale 30x (60k vectors), sf10 = "
                     "GenScale 100x (200k vectors); data ratio 3.33x; "
                     "all query sides are FIXED (10 query vectors / 20 "
                     "bench vectors pinned to verbatim copy 0), so the "
                     "production-shaped expectation is linear-in-corpus "
                     "for brute/encode stages and flatter for the "
                     "cell-pruned probe stages"),
        "excluded": ("p39 semantic dedup: bench contract pins "
                     "maxCell=MaxValue to match the oracle's honest "
                     "all-pairs-per-cell model - contract-quadratic "
                     "by design (like p04); the capped production "
                     "path is covered by its own stress test"),
        "calibration_medians": cals,
        "runs": runs,
        "per_query": per_query,
        "conclusion": conclusion(per_query),
    }
    json.dump(artifact, open("PROBE_SIM_sf10.json", "w"), indent=1)
    print("[probe] wrote PROBE_SIM_sf10.json")


if __name__ == "__main__":
    main()
