"""Print the BA cells where L2A < MCPG (comma list for standing_pass --cells)."""
import csv, collections, sys
v = collections.defaultdict(lambda: collections.defaultdict(dict))
for r in csv.reader(open("results_quality/dist_table.csv")):
    if r and r[0] == "BA" and r[3] in ("l2a", "mcpg"):
        d = v[int(r[1])][r[3]]
        g = int(r[2])
        d[g] = max(d.get(g, float("-inf")), float(r[4]))
bad = []
for n in sorted(v):
    c = v[n]
    if "l2a" in c and "mcpg" in c:
        common = set(c["l2a"]) & set(c["mcpg"])
        la = sum(c["l2a"][g] for g in common)
        mc = sum(c["mcpg"][g] for g in common)
        if la < mc - 1e-9:
            bad.append(f"BA:{n}")
print(",".join(bad))
