#!/usr/bin/env python
"""Pack a directory of Taillard-format instance files into the bundled npz.

Usage: python tools/pack_instances.py <instance_dir> [out.npz]

The bundled benchmark suite (Taillard ta01-ta80 and Demirkol dmu16-dmu20) is
public benchmark data; this tool converts any directory of Taillard text files
into the single packed tensor file the engine loads
(jssenv_tpu/data/instances.npz).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jssenv_tpu import instances as inst


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    src = sys.argv[1]
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "jssenv_tpu", "data", "instances.npz")
    )
    names = sorted(os.listdir(src))
    specs = []
    for n in names:
        path = os.path.join(src, n)
        if not os.path.isfile(path):
            continue
        try:
            specs.append(inst.load_instance_file(path))
        except (ValueError, UnicodeDecodeError) as e:
            print(f"skipping {n}: {e}")
    iset = inst.stack_instances(specs)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    inst.save_instance_set(out, iset)
    print(
        f"packed {len(iset)} instances (pad {iset.jobs_pad}x{iset.machines_pad}) -> {out}"
    )


if __name__ == "__main__":
    main()
