"""Workflow-tool (ERT) hook implementations — see
:mod:`res2df_spark.hooks.forward_model_steps`."""
