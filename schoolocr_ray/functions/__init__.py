"""Pure per-turn extraction functions shared by the reference oracle and the
Ray pipeline stages, so per-turn equality is structural."""
