#!/usr/bin/env python3
"""Summarize a dev/settle.sh output directory into the per-key markdown
table BENCH_NOTES carries (round-15 directive #1). For each key, uses
the LAST accepted try's compact line (warm/steal healthy by settle.sh's
gate); keys with no accepted try are listed as REJECTED with their best
observed line (upper bound). Dev tooling, not shipped-library code.

Usage: python3 dev/settle_table.py <settle_outdir> [accept_log]
"""
import glob, json, os, re, sys

def last_compact(path):
    txt = open(path, errors="replace").read()
    lines = [l for l in txt.splitlines() if l.startswith('{"metric"')]
    if not lines:
        return None
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return None

def main(outdir, accept_log=None):
    accepted = {}  # key -> try number
    if accept_log and os.path.exists(accept_log):
        for m in re.finditer(r"^ACCEPT\s+(\S+)\s+try=(\d+)", open(accept_log).read(), re.M):
            accepted[m.group(1)] = int(m.group(2))
    keys = sorted({os.path.basename(p).rsplit(".", 2)[0]
                   for p in glob.glob(os.path.join(outdir, "*.err"))})
    rows = []
    for k in keys:
        tries = sorted(glob.glob(os.path.join(outdir, f"{k}.*.err")),
                       key=lambda p: int(p.rsplit(".", 2)[1]))
        pick, status = None, "REJECTED"
        if k in accepted:
            cand = os.path.join(outdir, f"{k}.{accepted[k]}.err")
            pick = last_compact(cand)
            # "ok" only when the accepted try actually parsed — an
            # unparsable accepted .err must not pre-stamp the fallback
            # pick as healthy (r15 advice)
            if pick is not None:
                status = "ok"
        if pick is None:
            # fall back to the healthiest try by warm sentinel; its own
            # in-artifact health verdict decides the status
            cands = [(last_compact(p), p) for p in tries]
            cands = [(c, p) for c, p in cands if c]
            if not cands:
                rows.append((k, None, status, [])); continue
            pick = min(cands, key=lambda cp: cp[0].get("warm", 99))[0]
            status = "ok" if pick.get("health", "") == "accepted" else "REJECTED"
        # duck seconds observed across ALL parsable tries of this key
        # (r15 verdict #6: a single-run duck column inherits baseline
        # wobble — q21_v2's DuckDB side ranged 1.26-3.10 s across
        # accepted windows; median-of-tries + band makes the noise
        # visible instead of silently mis-ranking the ratio)
        ducks = []
        for p in tries:
            c = last_compact(p)
            if not c:
                continue
            d, s = c.get("duck") or {}, c.get("slow", {}).get(k)
            if d.get("n") == 1 and d.get("geo") and s:
                ducks.append(s[0] / d["geo"])  # geo = spark_min/duck for n==1
        rows.append((k, pick, status, sorted(ducks)))
    print("| key | sf10 [min,med,max] | warm | steal | duck med [band] | ratio | adj | status |")
    print("| --- | --- | --- | --- | --- | --- | --- | --- |")
    for k, c, status, ducks in rows:
        if c is None:
            print(f"| {k} | no line | | | | | | {status} |")
            continue
        slow = c.get("slow", {}).get(k)
        trip = ",".join(f"{t:g}" for t in slow) if slow else "?"
        spark_min = slow[0] if slow else None
        dsec = ratio = adj = ""
        if ducks and spark_min is not None:
            dmed = ducks[len(ducks) // 2]
            dsec = f"{dmed:.2f}"
            if len(ducks) > 1 and ducks[-1] > ducks[0] * 1.05:
                dsec += f" [{ducks[0]:.2f},{ducks[-1]:.2f}]"
            ratio = f"{spark_min / dmed:.2f}"
            floor = c.get("floor")
            if floor is not None:
                adj = f"{max(spark_min - floor, 0.005) / dmed:.2f}"
        print(f"| {k} | [{trip}] | {c.get('warm')} | {c.get('steal')} "
              f"| {dsec} | {ratio} | {adj} | {status} |")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
