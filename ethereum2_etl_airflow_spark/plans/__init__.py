"""Plans: the check-query registry (driver contract) + plan inspection."""
