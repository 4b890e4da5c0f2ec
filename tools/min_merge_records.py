#!/usr/bin/env python3
"""Min-merge quiet bench artifacts into bench/quiet_records.json.

Protocol (BASELINE.md / VERDICT r18 standing item): records may only be
touched from artifacts whose own instrument reads quiet
(contention_suspect false), and a row's record can only DROP (min-merge).
Usage: min_merge_records.py <records.json> <new_git_sha> <artifact.json>...
Prints a diff summary; writes in place.
"""
import json, re, sys

def main():
    recs_path, sha = sys.argv[1], sys.argv[2]
    arts = sys.argv[3:]
    txt = open(recs_path).read()
    recs = dict((m.group(1), float(m.group(2))) for m in
                re.finditer(r'"(q_[A-Za-z0-9_]+)"\s*:\s*([0-9.]+)', txt))
    sf = re.search(r'"sf"\s*:\s*"([^"]+)"', txt).group(1)
    merged = dict(recs)
    sources = []
    for a in arts:
        d = json.load(open(a))
        if d.get("contention_suspect"):
            print(f"SKIP {a}: contention_suspect=true"); continue
        if d.get("sf", "").rstrip("/") != sf.rstrip("/"):
            print(f"SKIP {a}: sf {d.get('sf')} != {sf}"); continue
        if d.get("n_failed", 1) != 0:
            print(f"SKIP {a}: n_failed={d.get('n_failed')}"); continue
        sources.append(a)
        for q, v in d["queries"].items():
            if q not in merged or v < merged[q]:
                merged[q] = v
    dropped = {q: (recs.get(q), merged[q]) for q in merged
               if q not in recs or merged[q] < recs[q]}
    for q, (old, new) in sorted(dropped.items()):
        print(f"  {q}: {old} -> {round(new, 3)}")
    print(f"{len(dropped)} rows dropped, {len(merged)} total; "
          f"sum {round(sum(recs.values()), 1)} -> {round(sum(merged.values()), 1)}")
    old = json.loads(txt)
    out = {
        "sf": sf,
        "git_sha": sha,
        "source": (old.get("source", "") +
                   " | r19-opt: min-merged quiet artifacts "
                   + ", ".join(sources)
                   + " (each contention_suspect=false, first quiet windows "
                   "after six degraded rounds) on the optimized code — "
                   "rows only dropped, per the records protocol"),
        "queries": {q: merged[q] for q in sorted(merged)},
    }
    with open(recs_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {recs_path} at sha {sha}")

if __name__ == "__main__":
    main()
