"""Build a headless oracle binary from a reference project.

Copies /root/reference/<Proj>/<Proj>/ into a scratch dir, patches its
main.cpp (drop the GLUT viewport include, rename main, make the
compile-time #define knobs overridable), and compiles our
oracle_main.cpp against it with g++.  The reference tree is never
modified and no reference code enters the repo — the oracle exists to
regenerate golden images / photon dumps for tests (VERDICT.md #2).

Usage:
    python -m tools.oracle.build RayTracingProj8 [-D MIN_SAMPLE=4 ...]
    -> prints the path of the built binary; project copy (with data
       files) lives next to it.
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys

REFERENCE = "/root/reference"
SCRATCH = "/tmp/rtf_oracle"
HERE = os.path.dirname(os.path.abspath(__file__))

# object-like #defines we make overridable (#ifndef-wrapped)
_DEFINE_RE = re.compile(r"^#define\s+(\w+)\s+(\S.*?)\s*$")


def patch_main(text: str) -> str:
    out = []
    for line in text.splitlines():
        if re.search(r'#include\s+"viewport\.cpp"', line):
            out.append("// [oracle] viewport.cpp include removed")
            out.append("void ShowViewport();")
            continue
        if re.match(r"\s*int\s+main\s*\(", line):
            out.append(line.replace("main", "reference_main_unused", 1))
            continue
        m = _DEFINE_RE.match(line)
        if m and "(" not in m.group(1):
            name = m.group(1)
            out.append(f"#ifndef {name}")
            out.append(line)
            out.append(f"#endif  // {name}")
            continue
        out.append(line)
    return "\n".join(out) + "\n"


def build(project: str, defines=(), force: bool = False) -> str:
    src = os.path.join(REFERENCE, project, project)
    if not os.path.isdir(src):
        raise SystemExit(f"no such reference project: {src}")
    tag = "_".join([project] + [d.replace("=", "-") for d in defines])
    dst = os.path.join(SCRATCH, tag)
    binary = os.path.join(dst, "oracle")
    if os.path.exists(binary) and not force:
        return binary
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns(
        "*.xcodeproj", "CMakeFiles"))
    with open(os.path.join(src, "main.cpp")) as f:
        patched = patch_main(f.read())
    with open(os.path.join(dst, "main_patched.cpp"), "w") as f:
        f.write(patched)

    tinyxml = [os.path.join(dst, "tinyxml", n) for n in
               ("tinyxml.cpp", "tinyxmlerror.cpp", "tinyxmlparser.cpp",
                "tinystr.cpp")]
    sources = [os.path.join(HERE, "oracle_main.cpp"),
               os.path.join(dst, "scene.cpp"),
               os.path.join(dst, "texture.cpp"),
               os.path.join(dst, "include", "lodepng.cpp")] + tinyxml
    cmd = ["g++", "-O2", "-std=gnu++11", "-w",
           f"-DORACLE_MAIN_CPP=\"{dst}/main_patched.cpp\"",
           "-I", os.path.join(dst, "include"), "-I", dst,
           *[f"-D{d}" for d in defines],
           *sources, "-o", binary, "-lpthread"]
    print("[oracle] building", project, defines or "", file=sys.stderr)
    subprocess.run(cmd, check=True)
    return binary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("project")
    ap.add_argument("-D", dest="defines", action="append", default=[])
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    print(build(args.project, tuple(args.defines), force=args.force))


if __name__ == "__main__":
    main()
