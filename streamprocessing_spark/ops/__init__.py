"""Executable op scripts for engine.ExecOp — the reference's argv/stdout operator contract (ops/*/  in /root/reference)."""
