#!/usr/bin/env python3
"""Diff two Bench JSON lines (files containing the {"metric":...} line):
per-query delta sorted by regression size. Dev tooling only.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [min_delta_s]
"""
import json
import sys


def norm_key(k):
    """Reduce any key form to a zero-padded query number so artifacts
    stay comparable across renames: 'q112' == '112' ==
    'q112_bm25_inline'. Non-numeric keys pass through unchanged."""
    k = k.lstrip("q")
    head = k.split("_", 1)[0]
    return head.zfill(3) if head.isdigit() else k


def load(path):
    """Accept either raw Bench stdout (the one-line metric JSON) or a
    driver BENCH_r*.json artifact (which nests it under "parsed")."""
    with open(path) as f:
        text = f.read()
    try:
        whole = json.loads(text)
        d = whole["parsed"] if isinstance(whole, dict) and "parsed" in whole \
            else whole
    except json.JSONDecodeError:
        i = text.find('{"metric"')
        d = json.loads(text[i:].split("\n")[0])
    # Collisions (e.g. a rename landing both old and new rows in one
    # artifact) must not silently last-wins-drop a row from the diff:
    # keep every colliding row visible under a disambiguating suffix.
    queries = {}
    for k, v in d["queries"].items():
        nk = norm_key(k)
        if nk in queries:
            print(f"WARNING: keys collide on '{nk}' "
                  f"(raw '{k}' vs an earlier row) in {path}; keeping both",
                  file=sys.stderr)
            nk = f"{nk}!{k}"
        queries[nk] = v
    d["queries"] = queries
    return d


def main(old_path, new_path, min_delta=0.2):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({new['value'] - old['value']:+.1f}s); "
          f"queries: {len(oq)} -> {len(nq)}")
    deltas = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None:
            print(f"  NEW  {name}: {b:.2f}s")
        elif b is None:
            print(f"  GONE {name}: was {a:.2f}s")
        else:
            deltas.append((b - a, name, a, b))
    for d, name, a, b in sorted(deltas, reverse=True):
        if abs(d) >= min_delta:
            print(f"  {d:+.2f}s  {name}: {a:.2f} -> {b:.2f}")


if __name__ == "__main__":
    try:
        main(sys.argv[1], sys.argv[2],
             float(sys.argv[3]) if len(sys.argv) > 3 else 0.2)
    except BrokenPipeError:  # piped into head
        pass
