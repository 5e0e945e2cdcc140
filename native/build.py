"""Build the _mickey_io native extension in place.

Usage: python native/build.py   (or mickey_tpu.data.native.ensure_built())
"""

import os
import subprocess
import sys
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str:
    import numpy as np

    src = os.path.join(HERE, "mickey_io.cpp")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(HERE, f"_mickey_io{ext}")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out

    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src,
        "-ljpeg",
        "-lpthread",
        "-o",
        out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    print(build())
