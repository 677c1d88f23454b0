"""tracer.render"""
