classdef StreamSchema < handle
    % StreamSchema: field names/types/sizes of a river_spark stream, plus
    % the packed record layout the file backend stores.
    %
    % Reference API parity: matlab/StreamSchema.m in pbotros/river exposes
    % field_names / field_types / new_table over a MEX core; this binding
    % is pure M-code over the river_spark FILE backend instead (no MEX, no
    % Redis client required) — the layout contract it relies on is pinned
    % by the Python test suite (tests/test_matlab_contract.py):
    %   * records are PACKED little-endian (numpy structured dtype with
    %     no alignment padding): offsets are cumulative field sizes;
    %   * type names are the FieldType enum strings from
    %     river_spark/schema.py (DOUBLE FLOAT INT16 INT32 INT64
    %     FIXED_WIDTH_BYTES VARIABLE_WIDTH_BYTES).

    properties (SetAccess = private)
        names       % cellstr
        types       % cellstr of FieldType enum strings
        sizes       % double vector, bytes per field per sample
        offsets     % double vector, byte offset of each field in a record
        itemsize    % total bytes per packed sample
    end

    methods
        function this = StreamSchema(schema_json)
            % schema_json: the JSON string stored under "schema" in
            % metadata.json: {"field_definitions": [{name, size, type}...]}
            obj = jsondecode(schema_json);
            defs = obj.field_definitions;
            if isstruct(defs)
                n = numel(defs);
                get = @(i) defs(i);
            else  % jsondecode yields a cell array when sizes differ
                n = numel(defs);
                get = @(i) defs{i};
            end
            this.names = cell(1, n);
            this.types = cell(1, n);
            this.sizes = zeros(1, n);
            this.offsets = zeros(1, n);
            off = 0;
            for i = 1:n
                d = get(i);
                this.names{i} = char(d.name);
                this.types{i} = char(d.type);
                this.sizes(i) = double(d.size);
                this.offsets(i) = off;
                off = off + this.sizes(i);
            end
            this.itemsize = off;
        end

        function out = field_names(this)
            out = this.names;
        end

        function out = field_types(this)
            % MATLAB table VariableTypes for new_table/read_table.
            out = cell(1, numel(this.types));
            for i = 1:numel(this.types)
                out{i} = StreamSchema.matlab_type(this.types{i});
            end
        end

        function out = new_table(this, n)
            out = table('Size', [n, numel(this.names)], ...
                        'VariableTypes', this.field_types(), ...
                        'VariableNames', this.names);
        end

        function out = is_variable_width(this)
            out = any(strcmp(this.types, 'VARIABLE_WIDTH_BYTES'));
        end
    end

    methods (Static)
        function out = matlab_type(field_type)
            switch field_type
                case 'DOUBLE';               out = 'double';
                case 'FLOAT';                out = 'single';
                case 'INT16';                out = 'int16';
                case 'INT32';                out = 'int32';
                case 'INT64';                out = 'int64';
                case 'FIXED_WIDTH_BYTES';    out = 'cell';
                case 'VARIABLE_WIDTH_BYTES'; out = 'cell';
                otherwise
                    error('river_spark:schema', 'unknown field type %s', field_type);
            end
        end
    end
end
