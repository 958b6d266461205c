#!/usr/bin/env python3
"""Standalone op executable: CSV projection, the argv/stdout twin of the
reference's ops/app1op2/app1op2.go:10-19 — parse the value as CSV, emit
(col2, col3) as two stdout lines (re-keys the stream).
Run by engine.ExecOp once per record: ``app1op2.py <key> <value> [pattern]``."""
import csv
import io
import sys

row = next(csv.reader(io.StringIO(sys.argv[2])))
print(row[2])
print(row[3])
