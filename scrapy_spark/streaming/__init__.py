"""The streaming runtime: batch-epoch loop over a deterministic virtual
clock (SURVEY §2.8 ST1-ST7). Structured Streaming cannot express the cyclic
frontier dataflow (sink feeds source), so the epoch loop IS the runtime."""
