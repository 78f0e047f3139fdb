"""DataFrame -> DataFrame operator stages of the KG pipeline."""
