"""Build the native loader extension in place.

Usage: python native/build.py
Produces rgbd360_tpu/io/_native_loader.<abi>.so; the dataset layer picks it
up automatically (falls back to the pure-Python parser when absent).
"""

import subprocess
import sys
import sysconfig
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    src = ROOT / "native" / "loader.cpp"
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = ROOT / "rgbd360_tpu" / "io" / f"_native_loader{ext}"
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        str(src),
        "-o",
        str(out),
        "-pthread",
    ]
    print(" ".join(cmd))
    rc = subprocess.call(cmd)
    if rc == 0:
        print(f"built {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
