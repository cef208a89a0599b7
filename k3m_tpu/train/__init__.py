"""Training subsystem: optimizers, mesh/sharding, train state, drivers."""
