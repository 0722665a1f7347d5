"""Per-table integration templates (reference templates/news_table.py:1-42):
copy a module, rename TABLE_NAME, run. All business logic stays in the
shared pipeline."""
