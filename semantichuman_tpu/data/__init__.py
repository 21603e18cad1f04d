"""Host data pipeline: dataset containers, preprocessing CLIs, synthetic assets."""
