"""Sources: the synthetic Common-Crawl-style webpages table and parquet
helpers for the driver's testdata tables."""
