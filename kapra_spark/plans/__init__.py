"""End-to-end pipelines (anonymize, rollup+retention, resume)."""
