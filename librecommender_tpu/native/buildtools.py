"""Hash-keyed native build helper.

Artifacts are never committed; every build is keyed on the SHA-256 of the
source file (plus the compile command), stored in a ``<out>.build_hash``
sidecar. A stale or missing sidecar forces a recompile, so a fresh
clone/checkout always builds from the reviewed source rather than running
a shipped binary (advisor finding, round 1).
"""
import hashlib
import subprocess
from pathlib import Path


def build_native(src: Path, out: Path, cmd: list, extra_dep=None) -> Path:
    """Compile ``src`` into ``out`` with ``cmd`` unless the cached artifact
    matches the current source hash. ``extra_dep``: additional source file
    (e.g. an #include'd header) folded into the hash key."""
    src, out = Path(src), Path(out)
    deps = extra_dep if isinstance(extra_dep, (list, tuple)) else (
        [extra_dep] if extra_dep else [])
    dep_bytes = b"".join(Path(d).read_bytes() for d in deps)
    key = hashlib.sha256(
        src.read_bytes() + dep_bytes + "\x00".join(cmd).encode()
    ).hexdigest()
    sidecar = out.with_name(out.name + ".build_hash")
    if out.exists() and sidecar.exists() and sidecar.read_text().strip() == key:
        return out
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    sidecar.write_text(key)
    return out
