from res2df_spark.sources.deck import deck_records, parse_deck

__all__ = ["deck_records", "parse_deck"]
