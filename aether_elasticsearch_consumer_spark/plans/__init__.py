"""Staged DataFrame plans — the engine's equivalent of the reference's
job lifecycle (/root/reference/consumer/app/artifacts.py ESJob +
index_handler.py DDL/migration), re-expressed as checkpointed Spark stages.
"""
