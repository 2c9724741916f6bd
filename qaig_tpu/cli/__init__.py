"""Console entry points (also exposed as root-level scripts for
reference-CLI parity; see [project.scripts] in pyproject.toml)."""
