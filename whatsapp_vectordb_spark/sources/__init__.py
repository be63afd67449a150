from whatsapp_vectordb_spark.sources.compat import (
    read_chat_export,
    read_embeddings_csv,
    write_embeddings_csv,
)

__all__ = ["read_chat_export", "read_embeddings_csv", "write_embeddings_csv"]
