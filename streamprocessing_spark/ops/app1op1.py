#!/usr/bin/env python3
"""Standalone op executable: substring filter, the argv/stdout twin of the
reference's ops/app1op1/app1op1.go:9-18 — if the value contains the pattern,
re-emit (key, value) as two stdout lines, else print nothing.
Run by engine.ExecOp once per record: ``app1op1.py <key> <value> <pattern>``."""
import sys

key, value = sys.argv[1], sys.argv[2]
pattern = sys.argv[3] if len(sys.argv) > 3 else None
if pattern is not None and pattern in value:
    print(key)
    print(value)
