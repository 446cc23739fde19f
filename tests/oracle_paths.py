"""Reference-oracle discovery shared by the exactness test suites.

Policy (VERDICT r2 weak #1): the portable build (`.oracle/build-portable`,
GGML_NATIVE=OFF) is preferred because the -march=native build SIGILLs in the
quantized vec_dot paths on this host.  A missing artifact inside an EXISTING
oracle build is a hard FAILURE (stale build), never a silent skip; only a
machine with no oracle build at all skips.  Rebuild recipe:
.claude/skills/verify/SKILL.md.
"""

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
ORACLE = REPO / ".oracle"
# Preference order: portable first (see module docstring).
BUILD_DIRS = [ORACLE / "build-portable", ORACLE / "build"]


def oracle_builds() -> list:
    """Oracle build trees that exist on this machine."""
    return [d for d in BUILD_DIRS if (d / "bin").is_dir()]


def find_bin(name: str):
    """Locate a built oracle artifact (binary or .so) or None."""
    for d in BUILD_DIRS:
        p = d / "bin" / name
        if p.exists():
            return p
    return None


def require_bin(name: str) -> pathlib.Path:
    """Locate an oracle artifact; fail loudly on a stale build, skip only
    when no oracle build exists at all."""
    p = find_bin(name)
    if p is not None:
        return p
    builds = oracle_builds()
    if builds:
        pytest.fail(
            f"oracle build exists ({builds[0]}) but '{name}' is missing — "
            "stale/incomplete build; rerun ninja per "
            ".claude/skills/verify/SKILL.md", pytrace=False)
    pytest.skip(f"reference oracle not built ('{name}'); see "
                ".claude/skills/verify/SKILL.md")


def find_tool(name: str):
    """Locate a repo-built oracle helper living directly under .oracle/
    (oracle_dump, oracle_dump_portable, parakeet_oracle)."""
    p = ORACLE / name
    return p if p.exists() else None
