"""Pipeline orchestration: resumable step DAGs (process_steps analog)."""
