#!/usr/bin/env python
"""Extract published-optimum golden schedules into tests/data/golden_solutions.json.

The golden schedules are public benchmark data (per-machine job orders of
known-optimal Taillard solutions, originally published at optimizizer.com) that
the reference embeds inline in its test code. This tool pulls the data arrays
out of a reference checkout into a standalone JSON data file keyed by instance
name, so the replay tests here are data-driven.

Usage: python tools/extract_golden.py /root/reference/tests/test_solutions.py
"""

import ast
import json
import os
import sys


def main() -> None:
    src_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/test_solutions.py"
    out_path = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "golden_solutions.json")
    with open(src_path) as f:
        tree = ast.parse(f.read())

    golden = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.FunctionDef) and node.name.startswith("test_optimum_")):
            continue
        name = node.name.replace("test_optimum_", "")
        seq = None
        makespans = []
        for sub in ast.walk(node):
            if isinstance(sub, ast.Assign):
                for tgt in sub.targets:
                    if isinstance(tgt, ast.Name) and tgt.id == "solution_sequence":
                        seq = ast.literal_eval(sub.value)
            if isinstance(sub, ast.Call) and getattr(sub.func, "attr", "") == "assertEqual":
                consts = [a.value for a in sub.args if isinstance(a, ast.Constant) and isinstance(a.value, int)]
                has_clock = any(
                    isinstance(a, ast.Attribute) and a.attr == "current_time_step"
                    for a in sub.args
                )
                if has_clock and consts:
                    makespans.extend(consts)
        if seq is None or not makespans:
            print(f"skipping {name}: no sequence/makespan found")
            continue
        golden[name] = {"optimum": max(makespans), "machine_order": seq}

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(golden, f, separators=(",", ":"))
    sizes = {k: v["optimum"] for k, v in golden.items()}
    print(f"extracted {len(golden)} golden schedules -> {out_path}")
    print(sizes)


if __name__ == "__main__":
    main()
