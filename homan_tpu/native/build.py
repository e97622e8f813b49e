"""Build the native meshops library: python -m homan_tpu.native.build"""
import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    here = os.path.dirname(__file__)
    src = os.path.join(here, "meshops.cpp")
    out = os.path.join(here, "libmeshops.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
