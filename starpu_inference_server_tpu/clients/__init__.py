"""Clients: load-generating benchmark client (schedule replay + summary
JSON) and helpers.

Reference counterpart: src/grpc/client (C++ async load generator) and
client/bert_inference_client.py.
"""
