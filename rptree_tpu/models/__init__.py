"""Index structures: static tree plans and the RP forest model."""
