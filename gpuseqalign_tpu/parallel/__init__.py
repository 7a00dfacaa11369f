# Batch and multi-chip engines (parallel.batch / parallel.giant / parallel.mesh).
