"""Pipeline orchestration: configs, stage runner, lineage, resume."""
