#!/usr/bin/env python3
"""Standalone op executable: equality filter + projection, the argv/stdout
twin of the reference's ops/app2op1/app2op1.go:10-22 — if CSV col6 equals
the pattern, print (col8, "1") as two stdout lines, else print nothing.
Run by engine.ExecOp once per record: ``app2op1.py <key> <value> <pattern>``."""
import csv
import io
import sys

key, value = sys.argv[1], sys.argv[2]
pattern = sys.argv[3] if len(sys.argv) > 3 else None
row = next(csv.reader(io.StringIO(value)))
if row[6] == pattern:
    print(row[8])
    print("1")
