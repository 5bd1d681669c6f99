#!/usr/bin/env python3
"""Regenerate the PLANS.md per-query plan-shape table.

Usage:
  sbt -batch "runMain graft.Explain /root/testdata/sf0.001" > /tmp/explain.log 2>&1
  python3 tools/plans_table.py /tmp/explain.log     # prints the markdown table

Counts Exchange / BroadcastExchange nodes per query and tags notable
operators (bnlj, bhj, topk = TakeOrderedAndProject, wgl = WindowGroupLimit).
"""
import re, sys

txt = open(sys.argv[1]).read()
txt = re.sub(r'^\[info\] ', '', txt, flags=re.M)
blocks = re.split(r'[━?]{6,} (q_\w+) [━?]{6,}', txt)
rows = []
for i in range(1, len(blocks), 2):
    name, body = blocks[i], blocks[i + 1]
    sh = len(re.findall(r'\(\d+\) Exchange\b', body))
    bc = len(re.findall(r'\(\d+\) BroadcastExchange\b', body))
    notes = []
    if 'BroadcastNestedLoopJoin' in body: notes.append('bnlj')
    if 'BroadcastHashJoin' in body: notes.append('bhj')
    if 'TakeOrderedAndProject' in body: notes.append('topk')
    if 'WindowGroupLimit' in body: notes.append('wgl')
    if 'CartesianProduct' in body: notes.append('CARTESIAN!')
    rows.append((name, sh, bc, ' '.join(notes)))
print("| query | shuffles | bcast | notes |")
print("|---|---|---|---|")
for n, s, b, t in sorted(rows):
    print(f"| {n} | {s} | {b} | {t} |")
