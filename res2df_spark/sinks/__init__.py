from res2df_spark.sinks.writers import (
    df_to_include,
    rle_encode,
    rle_encode_distributed,
    write_dataframe,
    write_parquet_with_metadata,
)

__all__ = [
    "df_to_include",
    "rle_encode",
    "rle_encode_distributed",
    "write_dataframe",
    "write_parquet_with_metadata",
]
