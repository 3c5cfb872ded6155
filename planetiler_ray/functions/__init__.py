"""Scalar function library + boolean match DSL (reference: util/Parse.java,
util/LanguageUtils.java, expression/Expression.java)."""
