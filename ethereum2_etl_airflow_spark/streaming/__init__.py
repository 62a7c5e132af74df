"""Structured Streaming: the always-on analog of the hourly cron DAGs."""
