"""Engine operators: compositions of DataFrame primitives implementing
semantics Spark lacks as built-ins (SURVEY.md §2.3 J6, §2.5 W1/W2,
§2.2 J1/J2 spatial)."""
