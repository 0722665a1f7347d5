"""Logical→concrete model-name resolution (reference op M1, models.py:38-87).

Driver-side config, broadcast-safe (a plain dict captured in closures is
fine at any scale — it's a handful of strings)."""

from __future__ import annotations

MODEL_MAP = {
    "nano": "gpt-4.1-nano-2025-04-14",
    "mini": "gpt-4.1-mini-2025-04-14",
    "full": "gpt-4.1-2025-04-14",
}

TEXT_CHAT_MODELS = [
    "gpt-4.1-2025-04-14",
    "gpt-4.1-mini-2025-04-14",
    "gpt-4.1-nano-2025-04-14",
    "gpt-4o",
    "gpt-4o-mini",
    "gpt-4o-2024-05-13",
    "gpt-3.5-turbo",
    "gpt-3.5-turbo-16k",
    "gpt-4",
    "gpt-4-32k",
    "gpt-4-turbo-preview",
    "gpt-4-vision-preview",
    "gpt-4-turbo",
    "gpt-4-0125-preview",
    "gpt-3.5-turbo-1106",
    "gpt-4-0314",
    "gpt-4-turbo-2024-04-09",
    "gpt-4-32k-0314",
    "gpt-4-32k-0613",
]

EMBEDDING_MODELS = [
    "text-embedding-3-large",
    "text-embedding-3-small",
    "text-embedding-ada-002",
]

SUPPORTED_MODELS = set(TEXT_CHAT_MODELS) | set(EMBEDDING_MODELS)


def resolve(model_key: str) -> str:
    """Logical key → concrete id; known concrete ids pass through; unknown
    defaults to nano (reference models.py:75-87)."""
    if model_key in MODEL_MAP:
        return MODEL_MAP[model_key]
    if model_key in SUPPORTED_MODELS:
        return model_key
    return MODEL_MAP["nano"]
