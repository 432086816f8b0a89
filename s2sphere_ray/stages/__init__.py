"""Ray Data operator stages (SURVEY.md §2.3 engine inventory E0–E19)."""
