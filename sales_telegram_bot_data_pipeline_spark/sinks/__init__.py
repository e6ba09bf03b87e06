from .kv import InMemoryKVStore, write_kv_upsert
from .webhook import WebhookBatcher

__all__ = ["InMemoryKVStore", "write_kv_upsert", "WebhookBatcher"]
