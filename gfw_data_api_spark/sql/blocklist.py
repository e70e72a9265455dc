"""Function denylist for the guarded query surface.

These are the PostgreSQL administrative / system / session function names
(from the public PostgreSQL 11 documentation chapters functions-admin and
functions-info) that the reference blocks, plus the prefix rules
(``pg_*``, ``_*``, ``postgis*``) and the SQL value functions.

Reference parity: app/models/enum/pg_admin_functions.py:1-145,
app/models/enum/pg_sys_functions.py:1-146,
app/routes/datasets/utils/query_helpers.py:50-78,121-142,229-235.

Mostly moot on Spark (none of these names resolve), but preserved so the
endpoint rejects exactly what the reference rejects.
"""

from __future__ import annotations

# functions-admin.html
_ADMIN_FUNCTIONS = [
    # configuration settings
    "current_setting",
    "set_config",
    # server signaling
    "pg_cancel_backend",
    "pg_reload_conf",
    "pg_rotate_logfile",
    "pg_terminate_backend",
    # backup control
    "pg_create_restore_point",
    "pg_current_wal_flush_lsn",
    "pg_current_wal_insert_lsn",
    "pg_current_wal_lsn",
    "pg_start_backup",
    "pg_stop_backup",
    "pg_is_in_backup",
    "pg_backup_start_time",
    "pg_switch_wal",
    "pg_walfile_name",
    "pg_walfile_name_offset",
    "pg_wal_lsn_diff",
    # recovery information
    "pg_is_in_recovery",
    "pg_last_wal_receive_lsn",
    "pg_last_wal_replay_lsn",
    "pg_last_xact_replay_timestamp",
    # recovery control
    "pg_is_wal_replay_paused",
    "pg_wal_replay_pause",
    "pg_wal_replay_resume",
    # snapshot synchronization
    "pg_export_snapshot",
    # replication
    "pg_create_physical_replication_slot",
    "pg_drop_replication_slot",
    "pg_create_logical_replication_slot",
    "pg_logical_slot_get_changes",
    "pg_logical_slot_peek_changes",
    "pg_logical_slot_get_binary_changes",
    "pg_logical_slot_peek_binary_changes",
    "pg_replication_slot_advance",
    "pg_replication_origin_create",
    "pg_replication_origin_drop",
    "pg_replication_origin_oid",
    "pg_replication_origin_session_setup",
    "pg_replication_origin_session_reset",
    "pg_replication_origin_session_is_setup",
    "pg_replication_origin_session_progress",
    "pg_replication_origin_xact_setup",
    "pg_replication_origin_xact_reset",
    "pg_replication_origin_advance",
    "pg_replication_origin_progress",
    "pg_logical_emit_message",
    # database object size
    "pg_column_size",
    "pg_database_size",
    "pg_indexes_size",
    "pg_relation_size",
    "pg_size_bytes",
    "pg_size_pretty",
    "pg_table_size",
    "pg_tablespace_size",
    "pg_total_relation_size",
    # database object location
    "pg_relation_filenode",
    "pg_relation_filepath",
    "pg_filenode_relation",
    # collation management
    "pg_collation_actual_version",
    "pg_import_system_collations",
    # index maintenance
    "brin_summarize_new_values",
    "brin_summarize_range",
    "brin_desummarize_range",
    "gin_clean_pending_list",
    # generic file access
    "pg_ls_dir",
    "pg_ls_logdir",
    "pg_ls_waldir",
    "pg_read_file",
    "pg_read_binary_file",
    "pg_stat_file",
    # advisory locks
    "pg_advisory_lock",
    "pg_advisory_lock_shared",
    "pg_advisory_unlock",
    "pg_advisory_unlock_all",
    "pg_advisory_unlock_shared",
    "pg_advisory_xact_lock",
    "pg_advisory_xact_lock_shared",
    "pg_try_advisory_lock",
    "pg_try_advisory_lock_shared",
    "pg_try_advisory_xact_lock",
    "pg_try_advisory_xact_lock_shared",
    # event trigger / table rewrite
    "pg_event_trigger_table_rewrite_oid",
    "pg_event_trigger_table_rewrite_reason",
]

# functions-info.html
_SYS_FUNCTIONS = [
    # session information
    "current_query",
    "current_schema",
    "current_schemas",
    "inet_client_addr",
    "inet_client_port",
    "inet_server_addr",
    "inet_server_port",
    "pg_backend_pid",
    "pg_blocking_pids",
    "pg_conf_load_time",
    "pg_current_logfile",
    "pg_my_temp_schema",
    "pg_is_other_temp_schema",
    "pg_jit_available",
    "pg_listening_channels",
    "pg_notification_queue_usage",
    "pg_postmaster_start_time",
    "pg_safe_snapshot_blocking_pids",
    "pg_trigger_depth",
    "version",
    # access privilege inquiry
    "has_any_column_privilege",
    "has_column_privilege",
    "has_database_privilege",
    "has_foreign_data_wrapper_privilege",
    "has_function_privilege",
    "has_language_privilege",
    "has_schema_privilege",
    "has_sequence_privilege",
    "has_server_privilege",
    "has_table_privilege",
    "has_tablespace_privilege",
    "has_type_privilege",
    "pg_has_role",
    "row_security_active",
    # schema visibility inquiry
    "pg_collation_is_visible",
    "pg_conversion_is_visible",
    "pg_function_is_visible",
    "pg_opclass_is_visible",
    "pg_operator_is_visible",
    "pg_opfamily_is_visible",
    "pg_statistics_obj_is_visible",
    "pg_table_is_visible",
    "pg_ts_config_is_visible",
    "pg_ts_dict_is_visible",
    "pg_ts_parser_is_visible",
    "pg_ts_template_is_visible",
    "pg_type_is_visible",
    # system catalog information
    "format_type",
    "pg_get_constraintdef",
    "pg_get_expr",
    "pg_get_functiondef",
    "pg_get_function_arguments",
    "pg_get_function_identity_arguments",
    "pg_get_function_result",
    "pg_get_indexdef",
    "pg_get_keywords",
    "pg_get_ruledef",
    "pg_get_serial_sequence",
    "pg_get_statisticsobjdef",
    "pg_get_triggerdef",
    "pg_get_userbyid",
    "pg_get_viewdef",
    "pg_index_column_has_property",
    "pg_index_has_property",
    "pg_indexam_has_property",
    "pg_options_to_table",
    "pg_tablespace_databases",
    "pg_tablespace_location",
    "pg_typeof",
    "pg_collation_for",
    "to_regclass",
    "to_regproc",
    "to_regprocedure",
    "to_regoper",
    "to_regoperator",
    "to_regtype",
    "to_regnamespace",
    "to_regrole",
    # object information and addressing
    "pg_describe_object",
    "pg_identify_object",
    "pg_identify_object_as_address",
    "pg_get_object_address",
    # comment information
    "col_description",
    "obj_description",
    "shobj_description",
    # transaction ids and snapshots
    "txid_current",
    "txid_current_if_assigned",
    "txid_current_snapshot",
    "txid_snapshot_xip",
    "txid_snapshot_xmax",
    "txid_snapshot_xmin",
    "txid_visible_in_snapshot",
    "txid_status",
    # committed transaction information
    "pg_xact_commit_timestamp",
    "pg_last_committed_xact",
    # control data
    "pg_control_checkpoint",
    "pg_control_system",
    "pg_control_init",
    "pg_control_recovery",
]

FORBIDDEN_FUNCTION_NAMES: frozenset[str] = frozenset(
    name.lower() for name in _ADMIN_FUNCTIONS + _SYS_FUNCTIONS
)

# Paren-less special forms the Postgres grammar parses as SQLValueFunction;
# the reference rejects every one of them (query_helpers.py:229-235).
SQL_VALUE_FUNCTIONS: frozenset[str] = frozenset(
    {
        "current_catalog",
        "current_role",
        "current_user",
        "session_user",
        "user",
        "current_schema",
        "current_date",
        "current_time",
        "current_timestamp",
        "localtime",
        "localtimestamp",
    }
)

FORBIDDEN_PREFIXES: tuple[str, ...] = ("pg_", "_", "postgis")

# Spark-side dangerous builtins: the guarded SQL executes on Spark, not
# Postgres, so the JVM escape hatches must be denied too (reflect /
# java_method invoke arbitrary public static methods).
SPARK_FORBIDDEN_FUNCTIONS: frozenset[str] = frozenset(
    {"reflect", "java_method", "assert_true", "raise_error"}
)


def is_forbidden_function(name: str) -> bool:
    """True if a called function name is admin/system/private."""
    lowered = name.lower()
    return (
        lowered.startswith(FORBIDDEN_PREFIXES)
        or lowered in FORBIDDEN_FUNCTION_NAMES
        or lowered in SPARK_FORBIDDEN_FUNCTIONS
    )
