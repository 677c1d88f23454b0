"""tracer.utils"""
