#!/usr/bin/env python3
"""Standalone op executable: key passthrough → count path, the argv/stdout
twin of the reference's ops/app2op2/app2op2.go:8-14 — print exactly the key
(one line), which routes the record into the framework's stateful count.
Run by engine.ExecOp once per record: ``app2op2.py <key> <value> [pattern]``."""
import sys

print(sys.argv[1])
